"""Zero-training analytic probe of the t_y READOUT hypothesis.

Three experiments (s4 loss up-weighting, s6a uvprod cue injection) left the
lateral axis unlearned while t_x/t_z converged (docs/ACCURACY.md).  The
remaining suspect is the READOUT: G's 1x1-conv head + global mean pool can
average per-pixel VALUE comparisons (that is why depth-axis x and vertical z
work) but cannot express a DISPLACEMENT between where image structure is and
where the cloud lands.  Before building a matching module, this probe
measures whether the displacement signal exists at all — with zero training:
scan candidate translations along one velo axis, re-project the cloud at the
EF(H)-aligned pose shifted by each candidate, and score the masked robust
mismatch between the candidate sparse depth and a dense depth image.

Arms (per scanned axis):
  dimg   — match against G's own dense depth head (the signal an in-model
           matching readout could actually use at inference)
  oracle — match against the TRUE gt-pose depth render of the same cloud
           (upper bound: a flat oracle curve means the score machinery is
           broken, not that the signal is absent)

The x-axis scan is the built-in positive control: t_x IS a depth-mismatch
cue (the trained trunk demonstrably reads it), so the probe must recover it
for its t_y verdict to mean anything.

Writes benchmarks/ty_probe_result.json.  Reference readout being probed:
/root/reference/nets/gnet.py:142-166 (1x1 convs + mean over HW).

Usage:
    python benchmarks/ty_matching_probe.py [config] [ckpt.npz]
    # defaults: configs/test_synthetic_s6a_running.yaml + its ckpt_path
Env: EFGH_PROBE_SAMPLES (default 16), EFGH_PROBE_SPAN (default 3.0),
     EFGH_PROBE_K (default 61), EFGH_PROBE_CLIP (robust clip, default 3.0 m)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "ty_probe_result.json")


def _refine_argmin(deltas, scores):
    """Grid argmin + quadratic interpolation around it (sub-step accuracy)."""
    import numpy as np

    i = int(np.argmin(scores))
    if 0 < i < len(deltas) - 1:
        y0, y1, y2 = scores[i - 1], scores[i], scores[i + 1]
        denom = y0 - 2 * y1 + y2
        if denom > 1e-12:
            step = deltas[1] - deltas[0]
            return float(deltas[i] + 0.5 * step * (y0 - y2) / denom)
    return float(deltas[i])


def main():
    t0 = time.time()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/xla")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("EFGH_PROBE_CPU"):
        # CPU smoke mode (this host prepends its TPU plugin to
        # jax_platforms; the env var alone is ignored — CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from efgh_tpu.config import Config
    from efgh_tpu.data import build_dataset
    from efgh_tpu.data.pipeline import collate
    from efgh_tpu.geometry import (
        compute_cam_T_velo,
        depth_image_from_pc,
        translation_matrix_from_vector,
    )
    from efgh_tpu.models import build_model
    from efgh_tpu.ops.lattice import set_merge_backend
    from efgh_tpu.train.loop import load_pretrained
    from efgh_tpu.train.state import create_state

    cfg_path = sys.argv[1] if len(sys.argv) > 1 else \
        "configs/test_synthetic_s6a_running.yaml"
    cfg = Config.from_yaml(cfg_path)
    ckpt = sys.argv[2] if len(sys.argv) > 2 else str(cfg.ckpt_path)
    n_samples = int(os.environ.get("EFGH_PROBE_SAMPLES", "16"))
    span = float(os.environ.get("EFGH_PROBE_SPAN", "3.0"))
    k = int(os.environ.get("EFGH_PROBE_K", "61"))
    clip = float(os.environ.get("EFGH_PROBE_CLIP", "3.0"))

    # forward-only driver path: reliability over speed (train/loop.py
    # forces the lax.sort merge under auto for the same reason)
    set_merge_backend("sort")

    model = build_model(cfg)
    ds = build_dataset(cfg.dataset, "test", cfg)
    n_samples = min(n_samples, len(ds))
    h, w = (int(x) for x in cfg.raw_cam_img_size)
    deltas = np.linspace(-span, span, k).astype(np.float32)
    deltas_j = jnp.asarray(deltas)

    batch0 = collate([ds[0]])
    state = create_state(model, cfg, batch0, jax.random.PRNGKey(0))
    if ckpt and ckpt != "fresh":
        state = load_pretrained(ckpt, state, cfg)
    else:
        print("[probe] ckpt='fresh': untrained weights (shape smoke only — "
              "the dimg arm is meaningless)")

    # running-BN forward (the reference protocol / headline eval mode);
    # return only what the scans need — g_depth is (1, 1, H, W)
    @jax.jit
    def fwd(params, batch_stats, pc, img, calib, A):
        ret = model.apply({"params": params, "batch_stats": batch_stats},
                          pc, img, calib, A, train=False)
        return {"e_l": ret["e_l"], "f_l": ret["f_l"], "h_c": ret["h_c"],
                "g_depth": ret["g_depth"]}

    @jax.jit
    def scan_axis(pc, calib, A, h_c, efh_s2s1, dense, img_mask, axis_onehot):
        """Mismatch-vs-candidate curve along one velo axis.

        dense: (H, W) target depth (dimg or the oracle gt render).
        Returns (K,) masked robust mean |dense - candidate sparse depth|.
        """
        def score(delta):
            t = (delta * axis_onehot)[None]  # (1, 3)
            l_t = translation_matrix_from_vector(t) @ efh_s2s1  # (1, 4, 4)
            cam = compute_cam_T_velo(h_c, l_t, calib, A)  # (1, 3, 4)
            d = depth_image_from_pc(pc[0], cam[0], (h, w),
                                    mode=str(cfg.get("projection_mode",
                                                     "near")))
            wd = d[3]  # (H, W) projective depth, 0 at empty pixels
            valid = (wd > 0) & (img_mask > 0)
            rob = jnp.minimum(jnp.abs(dense - wd), clip)
            return jnp.sum(rob * valid) / jnp.maximum(jnp.sum(valid), 1.0)

        return jax.lax.map(score, deltas_j)

    axes = {"x": np.array([1.0, 0, 0], np.float32),
            "y": np.array([0, 1.0, 0], np.float32)}
    samples = []
    for i in range(n_samples):
        b = collate([ds[i]])
        out = jax.device_get(fwd(state.params, state.batch_stats,
                                 b["pc"], b["img"], b["calib"], b["A"]))
        efh = np.asarray(out["f_l"]) @ np.asarray(out["e_l"])  # (1,4,4)
        gt_t = np.asarray(b["gts"]["sensor2_T_sensor1"])[0]
        gt_g = (gt_t @ np.linalg.inv(efh[0]))[:3, 3]  # G's true target
        dimg = jnp.asarray(out["g_depth"][0, 0])  # (H, W)
        img_mask = jnp.asarray(b["gts"]["img_mask"][0, 0])
        # oracle target: the same cloud rendered at the TRUE pose
        gt_cam = jnp.asarray(b["gts"]["cam_T_velo"][0])
        oracle = depth_image_from_pc(jnp.asarray(b["pc"][0]), gt_cam, (h, w))[3]

        rec = {"i": i, "gt_g_trs": [float(v) for v in gt_g], "curves": {}}
        for ax, onehot in axes.items():
            for arm, dense in (("dimg", dimg), ("oracle", oracle)):
                curves = jax.device_get(scan_axis(
                    jnp.asarray(b["pc"]), jnp.asarray(b["calib"]),
                    jnp.asarray(b["A"]), jnp.asarray(out["h_c"]),
                    jnp.asarray(efh), dense, img_mask, jnp.asarray(onehot)))
                est = _refine_argmin(deltas, np.asarray(curves))
                rec["curves"][f"{ax}_{arm}"] = {
                    "est": est,
                    "score_at_0": float(curves[k // 2]),
                    "score_min": float(np.min(curves)),
                    "scores": [round(float(v), 5) for v in curves],
                }
        samples.append(rec)
        print(f"[probe] sample {i}: gt=({gt_g[0]:+.2f},{gt_g[1]:+.2f},"
              f"{gt_g[2]:+.2f})  "
              + "  ".join(f"{kk}={vv['est']:+.2f}"
                          for kk, vv in rec["curves"].items()),
              flush=True)

    # per-axis/arm regression of est vs gt over the sample set
    summary = {}
    for ax_i, ax in (("0", "x"), ("1", "y")):
        gt_vals = np.array([s["gt_g_trs"][int(ax_i)] for s in samples])
        for arm in ("dimg", "oracle"):
            est = np.array([s["curves"][f"{ax}_{arm}"]["est"]
                            for s in samples])
            gv = gt_vals - gt_vals.mean()
            ev = est - est.mean()
            denom = float((gv * gv).sum())
            slope = float((gv * ev).sum() / denom) if denom > 0 else 0.0
            corr = (float((gv * ev).sum()
                          / max(np.sqrt((gv * gv).sum() * (ev * ev).sum()),
                                1e-12)))
            summary[f"{ax}_{arm}"] = {
                "slope": round(slope, 4), "corr": round(corr, 4),
                "mae": round(float(np.abs(est - gt_vals).mean()), 4),
                "gt_std": round(float(gt_vals.std()), 4),
                "est_std": round(float(est.std()), 4),
            }

    result = {
        "config": cfg_path, "ckpt": ckpt, "n_samples": n_samples,
        "grid": {"span_m": span, "k": k, "clip_m": clip},
        "summary": summary, "samples": samples,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"summary": summary, "wall_s": result["wall_s"]}))


if __name__ == "__main__":
    main()
