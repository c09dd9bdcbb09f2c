from efgh_tpu.geometry.rotations import (
    rotation_matrix_between_vectors,
    rotation_matrix_between_vectors_batched,
    rpy_to_matrix,
    xyz_to_matrix,
    translation_matrix_from_vector,
    vector_from_radian,
    matrix_3x3_to_4x4,
    normal_vector_from_abs_sign,
    sign_bits_to_class,
    compute_cam_T_velo,
)
from efgh_tpu.geometry.projections import (
    range_image_from_pc,
    depth_image_from_pc,
    sparse_depth_from_pc,
    rotate_image,
)
from efgh_tpu.geometry.metrics import (
    rre_rte,
    quaternion_angular_distance,
    matrix_to_quaternion,
)
