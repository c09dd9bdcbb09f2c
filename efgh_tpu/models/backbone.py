"""EFGH backbone: compose E -> H -> F -> G and the running cam_T_velo chain
(reference nets/efghbackbone.py)."""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from efgh_tpu.config import Config
from efgh_tpu.geometry import compute_cam_T_velo
from efgh_tpu.models.enet import Enet
from efgh_tpu.models.fnet import Fnet
from efgh_tpu.models.gnet import Gnet
from efgh_tpu.models.hnet import Hnet
from efgh_tpu.ops.lattice import LatticeScale


class EFGHBackbone(nn.Module):
    scale_map: Sequence[Sequence[float]]
    capacities: Sequence[int]
    raw_cam_img_size: Tuple[int, int] = (900, 1600)
    lidar_fov_rad: Tuple[float, float] = (0.125, -0.125)
    use_leaky: bool = True
    bcn_use_bias: bool = True
    bcn_use_norm: bool = True
    last_relu: bool = False
    projection_mode: str = "near"
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    pyramid_batching: str = "vmap"
    mesh_devices: int = 1
    g_coord_channels: Any = False  # False | "uv" | "uvprod" (models/gnet.py)
    g_matching: Any = False  # False | True | ((key, value), ...) overrides

    @classmethod
    def from_config(cls, cfg: Config) -> "EFGHBackbone":
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        # `pyramid_batching: auto` decides per-DEVICE, so it needs the mesh
        # size the step will run under (cfg.mesh_data; -1 = all devices)
        md = int(cfg.get("mesh_data", 1) or 1)
        if md == -1:
            import jax

            md = jax.device_count()
        return cls(
            pyramid_batching=str(cfg.get("pyramid_batching", "vmap")),
            mesh_devices=md,
            scale_map=tuple(tuple(s) for s in cfg.scale_map),
            capacities=tuple(cfg.lattice_capacity),
            raw_cam_img_size=tuple(cfg.raw_cam_img_size),
            lidar_fov_rad=tuple(cfg.lidar_fov_rad),
            use_leaky=cfg.use_leaky,
            bcn_use_bias=cfg.bcn_use_bias,
            bcn_use_norm=cfg.bcn_use_norm,
            last_relu=cfg.last_relu,
            projection_mode=cfg.projection_mode,
            compute_dtype=dtype,
            remat=bool(cfg.get("remat", False)),
            g_coord_channels=cfg.get("g_coord_channels", False),
            # YAML dict -> hashable tuple of items (linen modules must stay
            # hashable; list values become tuples); True/False pass through
            g_matching=(tuple(sorted(
                (k, tuple(v) if isinstance(v, list) else v)
                for k, v in m.items()))
                if isinstance(m := cfg.get("g_matching", False), dict)
                else bool(m)),
        )

    @nn.compact
    def __call__(
        self,
        pc: jnp.ndarray,
        img: jnp.ndarray,
        calib: jnp.ndarray,
        A: jnp.ndarray,
        pyramid: Optional[List[LatticeScale]] = None,
        train: bool = True,
    ):
        """Args:
          pc: (B, 3, N) decalibrated cloud.
          img: (B, 3, H, W) input image (half-res, 0..255 floats).
          calib: (B, 3, 4) initial extrinsic.
          A: (B, 3, 3) principal-point recentering matrix.
          pyramid: optional precomputed lattice pyramid for E.
        Returns:
          prediction dict (reference nets/efghbackbone.py:23-44).
        """
        range_img_size = (
            self.raw_cam_img_size[0] // 2,
            self.raw_cam_img_size[1] * 2,
        )

        rete = Enet(
            scale_map=self.scale_map,
            capacities=self.capacities,
            use_leaky=self.use_leaky,
            bcn_use_bias=self.bcn_use_bias,
            bcn_use_norm=self.bcn_use_norm,
            last_relu=self.last_relu,
            compute_dtype=self.compute_dtype,
            pyramid_batching=self.pyramid_batching,
            mesh_devices=self.mesh_devices,
            name="E",
        )(pc, pyramid=pyramid, train=train)
        reth = Hnet(compute_dtype=self.compute_dtype, remat=self.remat,
                    name="H")(img, train=train)

        ret = {**rete, **reth}
        ret["eh_cam_T_velo"] = compute_cam_T_velo(
            ret["intrinsic_sensor2"], ret["sensor2_T_sensor1"], calib, A
        )

        ret = Fnet(
            range_img_size=range_img_size,
            lidar_fov_rad=self.lidar_fov_rad,
            projection_mode=self.projection_mode,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            name="F",
        )(pc, ret, train=train)
        ret["efh_cam_T_velo"] = compute_cam_T_velo(
            ret["intrinsic_sensor2"], ret["sensor2_T_sensor1"], calib, A
        )

        ret = Gnet(
            raw_cam_img_size=self.raw_cam_img_size,
            projection_mode=self.projection_mode,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            coord_channels=self.g_coord_channels,
            matching=self.g_matching,
            name="G",
        )(pc, img, ret, train=train)
        ret["efgh_cam_T_velo"] = compute_cam_T_velo(
            ret["intrinsic_sensor2"], ret["sensor2_T_sensor1"], calib, A
        )
        ret["cam_T_velo"] = ret["efgh_cam_T_velo"]
        return ret
