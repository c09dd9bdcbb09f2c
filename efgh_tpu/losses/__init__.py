from efgh_tpu.losses.efghloss import EFGHCriterion, bce, smooth_l1
