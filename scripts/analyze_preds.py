"""Per-sample / per-axis analysis of a synthetic-benchmark prediction CSV.

Decomposes the headline RRE/RTE (reference common/helper.py:199-207 metric)
into per-axis translation regressions and outlier counts, against the frozen
synthetic test split (a pure function of its seed).  This is the diagnostic
that showed G learns velo-x (camera depth) and velo-z (camera vertical) long
before velo-y (camera horizontal) — the lateral axis is confounded with the
residual yaw error from F, so it is the last signal to emerge.

Usage:
    python scripts/analyze_preds.py [pred_csv] [config_yaml]
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from efgh_tpu.config import Config
    from efgh_tpu.data import build_dataset

    pred_csv = sys.argv[1] if len(sys.argv) > 1 else \
        "test/preds/synth/synthetic_frozen_test.csv"
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else \
        "configs/test_synthetic_running.yaml"

    cfg = Config.from_yaml(cfg_path)
    ds = build_dataset(cfg.dataset, "test", cfg)

    preds = {}
    for line in open(pred_csv):
        parts = line.strip().strip(",").split(",")
        preds[parts[0]] = np.array([float(x) for x in parts[1:]]).reshape(3, 4)

    rres, rtes, G, P = [], [], [], []
    for i in range(len(ds)):
        pc, img, calib, A, gts, fname = ds[i]
        gt = np.asarray(gts["sensor2_T_sensor1"])
        p = preds[fname]
        R, Rh = gt[:3, :3], p[:3, :3]
        c = (np.trace(R.T @ Rh) - 1) / 2
        rres.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
        rtes.append(np.linalg.norm(gt[:3, 3] - p[:3, 3]))
        G.append(gt[:3, 3])
        P.append(p[:3, 3])
    rres = np.array(rres)
    rtes = np.array(rtes)
    G = np.array(G)
    P = np.array(P)

    print(f"n={len(ds)}  RRE mean {rres.mean():.3f} med {np.median(rres):.3f} "
          f"std {rres.std():.3f} | RTE mean {rtes.mean():.3f} "
          f"med {np.median(rtes):.3f} std {rtes.std():.3f}")
    bad = rres > 15
    print(f"rotation outliers (RRE>15 deg): {int(bad.sum())}; "
          f"excluding them: RRE {rres[~bad].mean():.3f} "
          f"RTE {rtes[~bad].mean():.3f}")
    for ax, nm in enumerate("xyz"):
        a, b = np.polyfit(G[:, ax], P[:, ax], 1)
        r = np.corrcoef(G[:, ax], P[:, ax])[0, 1]
        print(f"  t_{nm} (velo): slope {a:+.3f} intercept {b:+.3f} "
              f"corr {r:+.3f} | gt std {G[:, ax].std():.3f} "
              f"pred std {P[:, ax].std():.3f}")
    worst = np.argsort(-rres)[:5]
    print("worst 5 by RRE:", [(int(i), round(float(rres[i]), 2))
                              for i in worst])


if __name__ == "__main__":
    main()
