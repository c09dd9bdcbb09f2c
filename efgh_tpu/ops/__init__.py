from efgh_tpu.ops.lattice import (
    LatticeScale,
    elevate_matrix,
    expected_std,
    filter_offsets,
    filter_size,
    get_keys_and_barycentric,
    build_lattice_scale,
    build_lattice_pyramid,
    bcl_splat,
    bcl_gather_neighbors,
    bcl_slice,
)
