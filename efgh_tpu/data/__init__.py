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
        return SyntheticDataset(
            num_samples=(args["train_samples"] if mode == "train"
                         else max(args["val_samples"], 4)),
            num_points=args["num_points"],
            raw_cam_img_size=args["raw_cam_img_size"],
        )
    return DATASETS[name](mode, args)
