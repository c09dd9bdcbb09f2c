"""E-net: ground-normal alignment of the LiDAR cloud.

Five stacked BCL splat stages over a coarsening permutohedral pyramid,
followed by a PointNet-style head predicting the gravity normal as
|n| (softmax-normalized) + an 8-class octant sign, decoded into the rotation
that maps the normal onto +z (reference nets/enet.py).

TPU redesign: the lattice pyramid is built **on-device inside the jitted
step** (reference rebuilds it on CPU via khash/numba every forward,
reference nets/enet.py:107 -> nets/generate_data.py:117), and the max-pool
masks phantom (padding) cells.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from efgh_tpu.geometry import (
    normal_vector_from_abs_sign,
    rotation_matrix_between_vectors_batched,
)
from efgh_tpu.models.bcl import BilateralConvFlex
from efgh_tpu.models.layers import (
    DenseTorch,
    MaskedBatchNorm,
    PointwiseConvRelu,
)
from efgh_tpu.ops.lattice import LatticeScale, build_lattice_pyramid, filter_size


def batched_pyramid(pc: jnp.ndarray, scale_map, capacities,
                    pyramid_batching: str = "vmap",
                    mesh_devices: int = 1) -> List[LatticeScale]:
    """Batched lattice pyramid build, shared by Enet's in-forward path and
    the split-executable drivers (cfg.split_forward; bench split mode)."""
    sm = tuple((float(s), int(r)) for s, r in scale_map)
    caps = tuple(int(c) for c in capacities)
    one = lambda p: build_lattice_pyramid(p, sm, caps)
    mode = pyramid_batching
    if mode == "auto":
        per_dev = max(1, pc.shape[0] // max(1, mesh_devices))
        mode = "map" if per_dev >= 8 else "vmap"
    if mode == "map":
        return jax.lax.map(one, pc)
    if mode != "vmap":
        raise ValueError(
            f"pyramid_batching must be auto|vmap|map (got {mode!r})")
    return jax.vmap(one)(pc)


class Enet(nn.Module):
    """Attributes mirror the reference config (reference nets/enet.py:14-101)."""

    scale_map: Sequence[Sequence[float]]
    capacities: Sequence[int]
    use_leaky: bool = True
    bcn_use_bias: bool = True
    bcn_use_norm: bool = True
    last_relu: bool = False
    dim: int = 3
    compute_dtype: jnp.dtype = jnp.float32
    # batch axis strategy for the pyramid build: "vmap" vectorizes every
    # sort/scan across the batch (fastest to run, but XLA compile time
    # explodes at batch >= 8 — docs/PERFORMANCE.md, benchmarks/
    # pyramid_compile_repro.py); "map" (lax.map) compiles the body once
    # and loops; "auto" picks vmap below a PER-DEVICE batch of 8, map at
    # or above.  The traced batch dim is the GLOBAL batch, so under a
    # data-parallel mesh auto divides by `mesh_devices` (wired from
    # cfg.mesh_data by EFGHBackbone.from_config) — the compile blowup is
    # per-device, and lax.map across a sharded axis would serialize what
    # the mesh parallelizes.  The two paths quantize coarser scales with
    # different ulp-level rounding (cell centers sit exactly on the next
    # scale's remainder planes), so pyramids agree structurally but not
    # bit-for-bit; either tie-break is a valid lattice
    # (tests/test_lattice.py).
    pyramid_batching: str = "vmap"
    mesh_devices: int = 1

    def build_pyramid(self, pc: jnp.ndarray) -> List[LatticeScale]:
        """(B, 3, N) -> batched lattice pyramid (on-device build)."""
        return batched_pyramid(pc, self.scale_map, self.capacities,
                               self.pyramid_batching, self.mesh_devices)

    @nn.compact
    def __call__(
        self,
        pc: jnp.ndarray,
        pyramid: Optional[List[LatticeScale]] = None,
        train: bool = True,
    ):
        """Args:
          pc: (B, 3, N) point cloud.
          pyramid: optional precomputed lattice pyramid.
        Returns:
          dict with e_gn_abs, e_gn_sgn, e_gn, e_l, sensor2_T_sensor1.
        """
        if pyramid is None:
            pyramid = self.build_pyramid(pc)

        d1 = self.dim + 1
        widths = [[32, 32], [64, 64], [128, 128], [256, 256], [256, 256]]

        # conv_in: 3x pointwise conv on xyz (reference nets/enet.py:24-28)
        x = jnp.swapaxes(pc, 1, 2)  # (B, N, 3)
        for i in range(3):
            x = PointwiseConvRelu(32, use_leaky=self.use_leaky,
                                  name=f"conv_in_{i}")(x)
        feats = jnp.swapaxes(x, 1, 2)  # (B, 32, N)

        for s, (scale_radius, cap, width) in enumerate(
            zip(self.scale_map, self.capacities, widths)
        ):
            lat = _index_pyramid(pyramid, s)
            fsz = filter_size(int(scale_radius[1]), self.dim)
            # input = concat(el_minus_gr, features) (reference nets/enet.py:113)
            fin = jnp.concatenate([lat.el_minus_gr, feats], axis=1)
            feats = BilateralConvFlex(
                num_output=width,
                filter_size=fsz,
                capacity=int(cap),
                use_norm=self.bcn_use_norm,
                use_leaky=self.use_leaky,
                last_relu=self.last_relu,
                do_splat=True,
                do_slice=False,
                use_bias=self.bcn_use_bias,
                compute_dtype=self.compute_dtype,
                name=f"bcn{s + 1}",
            )(fin, lat)

        final_lat = _index_pyramid(pyramid, len(self.capacities) - 1)

        # PointNet head (reference nets/enet.py:85-97,150-164); BN statistics
        # cover only real lattice cells (the reference's population)
        h = jnp.swapaxes(feats, 1, 2)  # (B, H, 256)
        for i, w in enumerate([128, 128, 128]):
            h = DenseTorch(w, name=f"conv_gn_{i + 1}")(h)
            h = MaskedBatchNorm(name=f"bn_gn_{i + 1}")(
                h, mask=final_lat.cell_valid, train=train)
            h = nn.relu(h)
        # masked global max-pool over lattice cells
        neg = jnp.finfo(h.dtype).min
        h = jnp.where(final_lat.cell_valid[:, :, None], h, neg)
        pooled = jnp.max(h, axis=1)  # (B, 128)

        g = nn.relu(DenseTorch(128, name="lin_gn_1")(pooled))
        g = nn.relu(DenseTorch(128, name="lin_gn_2")(g))
        g = nn.relu(DenseTorch(32, name="lin_gn_3")(g))
        gn_sgn = DenseTorch(8, name="lin_gn_sgn")(g)
        gn_abs0 = jax.nn.softmax(DenseTorch(3, name="lin_gn_abs")(g), axis=1)
        gn_abs = gn_abs0 / jnp.linalg.norm(gn_abs0, axis=1, keepdims=True)
        gn_abs = gn_abs[..., None]  # (B, 3, 1)

        # decode: no gradient flows through the geometric composition
        # (reference builds e_T with fresh tensors, nets/enet.py:176-177)
        e_gn = jax.lax.stop_gradient(normal_vector_from_abs_sign(gn_abs, gn_sgn))
        target_e3 = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0])[None, :, None], e_gn.shape
        )
        e_T = rotation_matrix_between_vectors_batched(e_gn, target_e3)

        return {
            "e_gn_abs": gn_abs,
            "e_gn_sgn": gn_sgn,
            "e_gn": e_gn,
            "e_l": e_T,
            "sensor2_T_sensor1": e_T,
        }


def _index_pyramid(pyramid, s: int) -> LatticeScale:
    """Select scale s whether `pyramid` is a list of LatticeScale or a single
    vmapped structure-of-lists."""
    if isinstance(pyramid, (list, tuple)) and isinstance(pyramid[s], LatticeScale):
        return pyramid[s]
    return pyramid[s]
