"""Statistical parity at the PRODUCTION scale_map.

The golden-activation suite (test_reference_parity.py) pins stage outputs at
perturbed scales because the production ratios (0.75/0.5/0.25/0.125,
reference configs/train_rellis.yaml:30-35) place coarsened lattice
coordinates exactly on rounding boundaries, where 1-ulp float differences
between frameworks flip individual cell memberships.  That leaves the exact
shipping configuration unpinned.  This test closes the gap statistically:
run both frameworks with identical weights on a population of random clouds
at the REAL scale_map and assert the final-pose disagreement distribution is
tight in aggregate (the per-cloud tail tolerates boundary-flip noise, which
the reference exhibits against itself across torch versions/devices).
"""

import numpy as np
import pytest

from tests.reference_harness import install_reference, reference_args

if not install_reference():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from efgh_tpu.models import EFGHBackbone  # noqa: E402
from efgh_tpu.train.convert import convert_torch_state_dict  # noqa: E402

RAW = (64, 128)
SCALE_MAP = ((1.0, 1), (0.75, 1), (0.5, 1), (0.25, 1), (0.125, 1))
CAPS = (1024, 1024, 1024, 1024, 512)
N = 60
N_CLOUDS = 20


def _cloud(seed):
    rng = np.random.RandomState(seed)
    yaw = np.linspace(-2.8, 2.8, N) + rng.uniform(-0.02, 0.02, N)
    pitch = np.tile(np.linspace(-0.3, 0.3, 6), 10)[:N]
    r = rng.uniform(5, 30, N)
    return np.stack([
        r * np.cos(pitch) * np.cos(yaw),
        r * np.cos(pitch) * np.sin(yaw),
        r * np.sin(pitch),
    ]).astype(np.float32)


def _pose_diff(t_a, t_b):
    """(deg, meters) disagreement between two rigid transforms."""
    ra, rb = t_a[:3, :3], t_b[:3, :3]
    cos = (np.trace(ra.T @ rb) - 1.0) / 2.0
    deg = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
    trs = np.linalg.norm(t_a[:3, 3] - t_b[:3, 3])
    return deg, trs


def test_production_scale_map_statistical_parity():
    args = reference_args(RAW, [list(s) for s in SCALE_MAP])
    from nets import EFGHBackbone as TorchBackbone

    torch.manual_seed(0)
    tmodel = TorchBackbone(args)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_torch_state_dict(sd)
    jmodel = EFGHBackbone(scale_map=SCALE_MAP, capacities=CAPS,
                          raw_cam_img_size=RAW)
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (1, 3, RAW[0] // 2, RAW[1] // 2)).astype(
        np.float32)
    calib = np.array([[[100.0, 0, 64, 0], [0, 100.0, 32, 0], [0, 0, 1, 0]]],
                     np.float32)
    a_mat = np.array([[[1, 0, -RAW[1] / 2], [0, 1, -RAW[0] / 2], [0, 0, 1]]],
                     np.float32)

    fwd = jax.jit(lambda v, pc, img, calib, a: jmodel.apply(
        v, pc, img, calib, a, train=False)["sensor2_T_sensor1"])

    rot_diffs, trs_diffs = [], []
    for seed in range(N_CLOUDS):
        pc = _cloud(100 + seed)[None]
        with torch.no_grad():
            tout = tmodel(torch.from_numpy(pc), torch.from_numpy(img),
                          torch.from_numpy(calib), torch.from_numpy(a_mat))
        t_pose = np.asarray(tout["sensor2_T_sensor1"][0])
        j_pose = np.asarray(fwd(variables, jnp.asarray(pc), jnp.asarray(img),
                                jnp.asarray(calib), jnp.asarray(a_mat))[0])
        deg, trs = _pose_diff(t_pose, j_pose)
        rot_diffs.append(deg)
        trs_diffs.append(trs)

    rot_diffs = np.array(rot_diffs)
    trs_diffs = np.array(trs_diffs)
    # aggregate tolerances: tight center, bounded tail.  The final pose is
    # dominated by the F/G regression heads; boundary-flipped lattice cells
    # perturb BCL features for a handful of points only.
    assert np.median(rot_diffs) < 0.5, rot_diffs
    assert np.median(trs_diffs) < 0.05, trs_diffs
    assert np.mean(rot_diffs < 2.0) >= 0.9, rot_diffs
    assert np.mean(trs_diffs < 0.2) >= 0.9, trs_diffs
