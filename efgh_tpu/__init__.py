"""EFGH-TPU: a TPU-native image <-> point-cloud registration framework.

A from-scratch JAX/Flax/Pallas re-design of the EFGHNet registration stack
(reference: yurimjeon1892/EFGH, PyTorch/CUDA).  Given one LiDAR point cloud
and one camera image with a perturbed extrinsic, the EFGH backbone predicts
the SE(3) transform ``sensor2_T_sensor1`` re-registering the cloud to the
camera plus an in-plane camera roll correction, through four canonicalization
stages (E: ground normal, H: horizon, F: yaw, G: translation).

Everything on the compute path is jit-able with static shapes: the
permutohedral bilateral-convolution lattice is built on-device with a
sort/searchsorted dedup instead of the reference's CPU khash+numba hash
table (reference nets/transforms.py:126-183), and all image/range/depth
projections are fixed-shape scatter ops.
"""

__version__ = "0.1.0"
