"""Bilateral Convolution Layer (BCL) as a Flax module.

SPLAT -> BLUR -> (optional) SLICE over a permutohedral lattice scale
(reference nets/bilateralNN.py:55-262), with the blur re-expressed as a
neighbor gather feeding one MXU matmul: the reference's Conv2d with kernel
(filter_size, 1) over the gathered neighbor axis is exactly a dense
(F*C_in) -> C_out contraction.  No chunking is needed — XLA tiles the
matmul; the gathered tensor lives in HBM at bf16 when compute_dtype says so.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from efgh_tpu.models.layers import leaky_relu, normal_init
from efgh_tpu.ops.lattice import LatticeScale, bcl_gather_neighbors, bcl_slice, bcl_splat


class BilateralConvFlex(nn.Module):
    """One BCL stage.

    Attributes:
      num_output: channel widths of the blur conv stack; the first conv
        contracts the neighbor axis, the rest are 1x1 (reference
        nets/bilateralNN.py:104-135).
      filter_size: number of lattice neighbors F = (r+1)^d1 - r^d1.
      capacity: static lattice cell capacity H of this scale.
      use_norm: density normalization in the splat.
      last_relu / use_leaky: activation plan of the final conv.
      do_splat: False means the input already lives on lattice cells.
      do_slice: True adds the gather-back-to-points stage.
      use_bias: slice-stage bias (only when do_slice).
    """

    num_output: Sequence[int]
    filter_size: int
    capacity: int
    use_norm: bool = True
    use_leaky: bool = True
    last_relu: bool = False
    do_splat: bool = True
    do_slice: bool = False
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        lat: LatticeScale,
        out_lat: Optional[LatticeScale] = None,
    ) -> jnp.ndarray:
        """Args:
          features: (B, C_in, P) point features (or (B, C_in, H) cell features
            when do_splat=False).
          lat: batched LatticeScale (leaves have a leading B axis).
          out_lat: lattice for the slice stage (defaults to `lat`).
        Returns:
          (B, C_out, H) cell features, or (B, C_out, P_out) if do_slice.
        """
        b, c_in, _ = features.shape
        cap = self.capacity

        # ---- SPLAT ----
        if self.do_splat:
            splat = jax.vmap(
                lambda f, w, o: bcl_splat(f, w, o, cap, normalize=self.use_norm)
            )(features, lat.barycentric, lat.lattice_offset)  # (B, H+1, C)
        else:
            splat = jnp.concatenate(
                [jnp.zeros((b, 1, c_in), features.dtype),
                 jnp.swapaxes(features, 1, 2)],
                axis=1,
            )

        # ---- BLUR ----
        gathered = jax.vmap(bcl_gather_neighbors)(
            splat.astype(self.compute_dtype), lat.blur_neighbors
        )  # (B, H, F, C_in)
        x = gathered.reshape(b, cap, self.filter_size * c_in)

        n_in = self.filter_size * c_in
        widths = list(self.num_output)
        for i, width in enumerate(widths):
            last = i == len(widths) - 1
            kshape = (n_in if i == 0 else widths[i - 1], width)
            kernel = self.param(f"blur_kernel_{i}", normal_init(1e-3), kshape)
            bias = self.param(f"blur_bias_{i}", nn.initializers.zeros, (width,))
            x = (
                jnp.einsum(
                    "bhc,cd->bhd", x, kernel.astype(self.compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                + bias
            )
            if not last:
                x = nn.relu(x)
            elif self.last_relu:
                x = leaky_relu(x, 0.1) if self.use_leaky else nn.relu(x)
            x = x.astype(self.compute_dtype)

        # zero out phantom cells so garbage never propagates to coarser scales
        x = jnp.where(lat.cell_valid[:, :, None], x, 0.0)
        cell_feats = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # (B, C_out, H)

        if not self.do_slice:
            return cell_feats

        ol = out_lat if out_lat is not None else lat
        sliced = jax.vmap(bcl_slice)(
            jnp.swapaxes(cell_feats, 1, 2), ol.barycentric, ol.lattice_offset
        )  # (B, C_out, P)
        if self.use_bias:
            bias = self.param("slice_bias", nn.initializers.zeros,
                              (self.num_output[-1],))
            sliced = sliced + bias[None, :, None]
        return sliced
