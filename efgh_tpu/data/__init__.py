from efgh_tpu.data.kitti_odom import KITTI_ODOM
from efgh_tpu.data.kitti_raw import KITTI_RAW
from efgh_tpu.data.pipeline import DataPipeline, SyntheticDataset, collate
from efgh_tpu.data.rellis3d import RELLIS_3D

# dataset registry, mirroring the reference's reflection construction
# (reference main.py:80: data_loader.__dict__[args['dataset']])
DATASETS = {
    "RELLIS_3D": RELLIS_3D,
    "KITTI_ODOM": KITTI_ODOM,
    "KITTI_RAW": KITTI_RAW,
}


def _nusc(mode, args):  # lazy: needs nuscenes-devkit
    from efgh_tpu.data.nuscenes import NUSC

    return NUSC(mode, args)


DATASETS["NUSC"] = _nusc


def build_dataset(name: str, mode: str, args):
    if name == "SYNTHETIC":
        # disjoint frozen splits: synthetic samples are a pure function of
        # (seed, index), so distinct per-mode seeds = distinct data
        dclb = args.get("dclb") or {}
        return SyntheticDataset(
            num_samples=(args["train_samples"] if mode == "train"
                         else max(args["val_samples"], 4)),
            num_points=args["num_points"],
            raw_cam_img_size=args["raw_cam_img_size"],
            seed={"train": 0, "valid": 10_000_019, "test": 20_000_003}.get(
                mode, 0),
            l_rot_range=dclb.get("l_rot_range", 1.0 / 6.0),
            l_trs_range=dclb.get("l_trs_range", 2.0),
            c_rot_range=dclb.get("c_rot_range", 1.0 / 6.0),
            cache_dir=args.get("sample_cache_dir", "") or "",
        )
    return DATASETS[name](mode, args)
