"""Zero-training analytic probe of the t_y READOUT hypothesis.

Three experiments (s4 loss up-weighting, s6a uvprod cue injection) left the
lateral axis unlearned while t_x/t_z converged (docs/ACCURACY.md).  The
remaining suspect is the READOUT: G's 1x1-conv head + global mean pool can
average per-pixel VALUE comparisons (that is why depth-axis x and vertical z
work) but cannot express a DISPLACEMENT between where image structure is and
where the cloud lands.  Before training a matching head, this probe measures
whether the displacement signal exists at all — with zero training — by
running the SHIPPED scan module (efgh_tpu/models/matching.py) over the
frozen eval split.

Arms (per scanned axis, 2x2):
  target:  dimg   — match against G's own dense depth head (the signal the
                    in-model readout actually uses at inference)
           oracle — match against the TRUE gt-pose depth render of the same
                    cloud (upper bound; a flat oracle curve means the score
                    machinery is broken, not that the signal is absent)
  t_base:  pred   — off-axis components held at the pooled head's own
                    estimate (deployment semantics: matching REFINES the
                    pooled readout)
           gt     — off-axis components held at the true residual (isolates
                    the scanned axis; a pred-arm failure with a gt-arm
                    success means off-axis error is drowning the cue)

The x-axis scan is the built-in positive control: t_x IS a depth-mismatch
cue (the trained trunk demonstrably reads it), so the probe must recover it
for its t_y verdict to mean anything.

v2 (this file): everything device-resident.  v1 pulled the (900,1600)
g_depth to host per sample and rendered oracles host-side — those bulk
readbacks hit the tunnel's INVALID_ARGUMENT stale-transport failure
(docs/PERFORMANCE.md) and the one-axis-at-EFH-error scan corrupted the
landscape (the gt residual is 3D).  Now one jitted function per sample
returns only curves (A, K) + scalars, and every scan is base-centered.

v3: one sample per PROCESS.  At this executable size (full forward +
2x2x25 renders) the tunnel mis-executes REPEATED runs of the same
loaded executable — sample 0 returns correctly, every later execution
readback fails INVALID_ARGUMENT and in-process retries stay poisoned
(measured on this host, 2026-08-21; same family as the repeated-Pallas
failure, docs/PERFORMANCE.md, here with the lax.sort merge).  A fresh
process resets the transport and the persistent XLA compile cache makes
re-entry ~10 s, so each invocation scores EFGH_PROBE_SAMPLES samples
starting at EFGH_PROBE_START, appends per-sample records to
benchmarks/ty_probe_samples.jsonl, and `--summarize` merges them.
Driver: scripts/run_ty_probe.sh.

Writes benchmarks/ty_probe_result.json.  Reference readout being probed:
/root/reference/nets/gnet.py:142-166 (1x1 convs + mean over HW).

Usage:
    python benchmarks/ty_matching_probe.py [config] [ckpt.npz]
    python benchmarks/ty_matching_probe.py --summarize
Env: EFGH_PROBE_START (default 0), EFGH_PROBE_SAMPLES (default 16),
     EFGH_PROBE_SPAN (default 3.0), EFGH_PROBE_K (default 25),
     EFGH_PROBE_CLIP (default 3.0 m), EFGH_PROBE_DS (default 4),
     EFGH_PROBE_CPU
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "ty_probe_result.json")
SAMPLES_JL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "ty_probe_samples.jsonl")


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
    from efgh_tpu.geometry import depth_image_from_pc
    from efgh_tpu.models import build_model
    from efgh_tpu.models.matching import LateralMatching
    from efgh_tpu.ops.lattice import set_merge_backend
    from efgh_tpu.train.loop import load_pretrained
    from efgh_tpu.train.state import create_state

    cfg_path = sys.argv[1] if len(sys.argv) > 1 else \
        "configs/test_synthetic_s6a_running.yaml"
    cfg = Config.from_yaml(cfg_path)
    ckpt = sys.argv[2] if len(sys.argv) > 2 else str(cfg.ckpt_path)
    start = int(os.environ.get("EFGH_PROBE_START", "0"))
    n_samples = int(os.environ.get("EFGH_PROBE_SAMPLES", "16"))
    span = float(os.environ.get("EFGH_PROBE_SPAN", "3.0"))
    k = int(os.environ.get("EFGH_PROBE_K", "25"))
    clip = float(os.environ.get("EFGH_PROBE_CLIP", "3.0"))
    ds_factor = int(os.environ.get("EFGH_PROBE_DS", "4"))

    # forward-only driver path: reliability over speed (train/loop.py
    # forces the lax.sort merge under auto for the same reason)
    set_merge_backend("sort")

    model = build_model(cfg)
    ds = build_dataset(cfg.dataset, "test", cfg)
    n_samples = min(n_samples, len(ds))
    h, w = (int(x) for x in cfg.raw_cam_img_size)
    deltas = np.linspace(-span, span, k).astype(np.float32)

    matcher = LateralMatching(
        raw_cam_img_size=(h, w), span=span, k=k, clip=clip,
        downsample=ds_factor, axes=(0, 1),
        projection_mode=str(cfg.get("projection_mode", "near")))

    batch0 = collate([ds[0]])
    state = create_state(model, cfg, batch0, jax.random.PRNGKey(0))
    if ckpt and ckpt != "fresh":
        state = load_pretrained(ckpt, state, cfg)
    else:
        print("[probe] ckpt='fresh': untrained weights (shape smoke only — "
              "the dimg arm is meaningless)")

    @jax.jit
    def probe_one(params, batch_stats, pc, img, calib, A, gt_T, gt_cam,
                  img_mask):
        """Forward + all four scan arms for one batch.  Tiny outputs only."""
        ret = model.apply({"params": params, "batch_stats": batch_stats},
                          pc, img, calib, A, train=False)
        efh = ret["f_l"] @ ret["e_l"]                      # (B, 4, 4)
        gt_resid = (gt_T @ jnp.linalg.inv(efh))[:, :3, 3]  # (B, 3)
        pred = ret["g_trs"][..., 0]                        # (B, 3)
        dimg = ret["g_depth"][:, 0]                        # (B, H, W)
        gmask = ret["g_mask"][:, 0]                        # (B, H, W) prob
        # oracle target: the same cloud rendered at the TRUE pose
        oracle = jax.vmap(lambda p, c: depth_image_from_pc(
            p, c, (h, w), mode=matcher.projection_mode))(pc, gt_cam)[:, 3]
        imask = img_mask[:, 0].astype(jnp.float32)         # (B, H, W)

        out = {"gt_resid": gt_resid, "pred": pred}
        for base_name, base in (("pred", pred), ("gt", gt_resid)):
            for tgt_name, dense, msk in (("dimg", dimg, gmask),
                                         ("oracle", oracle, imask)):
                _, aux = matcher.apply(
                    {}, pc, dense, msk, ret["efh_cam_T_velo"], efh,
                    t_base=base)
                out[f"{base_name}_{tgt_name}"] = {
                    "t_hat": aux["t_hat"], "curves": aux["curves"]}
        return out

    def fetch(fn, *args, tries=3):
        """device_get with stale-transport retry (docs/PERFORMANCE.md)."""
        for attempt in range(tries):
            try:
                return jax.device_get(fn(*args))
            except Exception as e:  # noqa: BLE001 — transport errors vary
                if attempt == tries - 1:
                    raise
                print(f"[probe] readback failed ({type(e).__name__}: {e}); "
                      f"retry {attempt + 1}/{tries - 1}", flush=True)
                time.sleep(5.0)

    arms = [f"{b}_{t}" for b in ("pred", "gt") for t in ("dimg", "oracle")]
    for i in range(start, min(start + n_samples, len(ds))):
        b = collate([ds[i]])
        out = fetch(probe_one, state.params, state.batch_stats,
                    jnp.asarray(b["pc"]), jnp.asarray(b["img"]),
                    jnp.asarray(b["calib"]), jnp.asarray(b["A"]),
                    jnp.asarray(b["gts"]["sensor2_T_sensor1"]),
                    jnp.asarray(b["gts"]["cam_T_velo"]),
                    jnp.asarray(b["gts"]["img_mask"]))
        gt = np.asarray(out["gt_resid"])[0]
        rec = {"i": i, "gt_resid": [float(v) for v in gt],
               "pred_trs": [float(v) for v in np.asarray(out["pred"])[0]],
               "arms": {}}
        for arm in arms:
            curves = np.asarray(out[arm]["curves"])[0]      # (A, K)
            t_hat = np.asarray(out[arm]["t_hat"])[0]        # (A,)
            for ax_i, ax in enumerate("xy"):
                c = curves[ax_i]
                rec["arms"][f"{ax}_{arm}"] = {
                    "est": _refine_argmin(deltas, c),
                    "soft": float(t_hat[ax_i]),
                    "score_at_0": float(c[k // 2]),
                    "score_min": float(np.min(c)),
                    "scores": [round(float(v), 5) for v in c],
                }
        rec["grid"] = {"span_m": span, "k": k, "clip_m": clip,
                       "downsample": ds_factor}
        rec["config"], rec["ckpt"] = cfg_path, ckpt
        with open(SAMPLES_JL, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[probe] sample {i}: gt=({gt[0]:+.2f},{gt[1]:+.2f},"
              f"{gt[2]:+.2f})  "
              + "  ".join(f"{kk}={vv['est']:+.2f}"
                          for kk, vv in rec["arms"].items()
                          if "dimg" in kk),
              flush=True)
    print(f"[probe] chunk done in {time.time() - t0:.1f}s", flush=True)


def summarize():
    """Merge ty_probe_samples.jsonl -> ty_probe_result.json (+ stdout)."""
    import numpy as np

    by_i = {}
    with open(SAMPLES_JL) as f:
        for line in f:
            rec = json.loads(line)
            by_i[rec["i"]] = rec  # last write per sample wins
    samples = [by_i[i] for i in sorted(by_i)]
    if not samples:
        raise SystemExit("no samples in " + SAMPLES_JL)
    arms = [f"{b}_{t}" for b in ("pred", "gt") for t in ("dimg", "oracle")]
    summary = {}
    for ax_i, ax in enumerate("xy"):
        gt_vals = np.array([s["gt_resid"][ax_i] for s in samples])
        for arm in arms:
            est = np.array([s["arms"][f"{ax}_{arm}"]["est"]
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
        "config": samples[0].get("config"), "ckpt": samples[0].get("ckpt"),
        "n_samples": len(samples), "grid": samples[0].get("grid"),
        "summary": summary, "samples": samples,
    }
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"n_samples": len(samples), "summary": summary}))


if __name__ == "__main__":
    if "--summarize" in sys.argv:
        summarize()
    else:
        main()
