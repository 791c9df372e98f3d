"""Held-out-view quality run on the TPU: the reference's flagship protocol
(benchmarks/QUALITY.md) — 26-view vessel-phantom dataset, custom 135/135
view held out, production train() loop.

Usage: python tools/quality_run.py [--iters 20000] [--march window|lattice]
       [--mlp auto|xla|pallas] [--log out.log]
"""

import argparse
import os
import sys

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
# persistent XLA executable cache: identical programs (re-runs, seed
# grids, the bench) skip the 4-12 s remote compiles entirely
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--march", default=None, help="march_mode override")
    ap.add_argument("--mlp", default=None, help="mlp_backend override")
    ap.add_argument("--sampling", default=None, help="sampling_impl override")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--display_every", type=int, default=500)
    ap.add_argument(
        "--jitter", action="store_true",
        help="enable jittered grid-update evaluation points (grid_jitter)",
    )
    ap.add_argument(
        "--carve", action="store_true",
        help="space-carving grid init (TrainConfig.carve_init; the round-4 "
        "default — this flag is now a no-op kept for queue-script compat)",
    )
    ap.add_argument(
        "--no_carve", action="store_true",
        help="disable the (round-4 default) space-carving grid init",
    )
    ap.add_argument(
        "--no_bucket_k", action="store_true",
        help="disable the (round-4 default) per-bucket-k two-bucket march",
    )
    ap.add_argument(
        "--reference_strict", action="store_true",
        help="reference-parity protocol (config.REFERENCE_STRICT_OVERRIDES)",
    )
    ap.add_argument(
        "--engage_max", type=int, default=None,
        help="interim compaction ladder cap (TrainConfig.compact_engage_max)",
    )
    ap.add_argument(
        "--k_margin", type=float, default=None,
        help="grid-evolution margin on k (TrainConfig.compact_k_margin)",
    )
    ap.add_argument(
        "--hybrid_split", type=float, default=None,
        help="two-bucket hybrid march split fraction (TrainConfig.hybrid_split)",
    )
    ap.add_argument(
        "--hybrid_bucket_k", action="store_true",
        help="per-bucket compaction width for the two-bucket march "
             "(TrainConfig.hybrid_bucket_k; needs --hybrid_split > 0)",
    )
    ap.add_argument(
        "--fka", default=None,
        help="first-k-active backend in the marches (TrainConfig.march_fka:"
             " xla|pallas)",
    )
    ap.add_argument(
        "--feature_major", action="store_true",
        help="feature-major fused-MLP input (TrainConfig.feature_major_mlp; "
             "skips the (P,3)->(8,P) relayout on the Pallas path)",
    )
    ap.add_argument(
        "--fused_step", action="store_true",
        help="whole-train-step fused kernel (TrainConfig.fused_train_step"
             "='auto'; ops/pallas/fused_step.py)",
    )
    ap.add_argument(
        "--tag", default="",
        help="provenance tag recorded in the persisted result row",
    )
    ap.add_argument(
        "--repeat", type=int, default=1,
        help="run train() N times in-process; runs 2+ reuse every compiled "
             "stepper (make_train_* are memoized) — the warm number is the "
             "honest production throughput once one-time compiles are paid",
    )
    args = ap.parse_args()

    from nerf_for_angiography_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()  # axon platform is off JAX's cache allowlist

    from nerf_for_angiography_tpu.data import (
        DatagenConfig, generate_dataset, make_vessel_volume,
    )
    from nerf_for_angiography_tpu.training import TrainConfig
    from nerf_for_angiography_tpu.training.loop import train

    kw = dict(n_iters=args.iters, display_every=args.display_every)
    if args.march:
        kw["march_mode"] = args.march
    if args.mlp:
        kw["mlp_backend"] = args.mlp
    if args.sampling:
        kw["sampling_impl"] = args.sampling
    if args.seed is not None:
        kw["seed"] = args.seed
    if args.jitter:
        kw["grid_jitter"] = True
    if args.reference_strict:
        from nerf_for_angiography_tpu.training.config import (
            REFERENCE_STRICT_OVERRIDES,
        )

        kw.update(REFERENCE_STRICT_OVERRIDES)
    if args.carve:
        kw["carve_init"] = True
    if args.no_carve:
        kw["carve_init"] = False
    if args.no_bucket_k:
        kw["hybrid_bucket_k"] = False
    if args.engage_max is not None:
        kw["compact_engage_max"] = args.engage_max
    if args.k_margin is not None:
        kw["compact_k_margin"] = args.k_margin
    if args.hybrid_split is not None:
        kw["hybrid_split"] = args.hybrid_split
    if args.hybrid_bucket_k:
        kw["hybrid_bucket_k"] = True
    if args.fused_step:
        kw["fused_train_step"] = "auto"
    if args.fka:
        kw["march_fka"] = args.fka
    if args.feature_major:
        kw["feature_major_mlp"] = True
    cfg = TrainConfig(**kw)
    dcfg = DatagenConfig(
        limited_size=180.0, number_angles=4.0, img_width=100, img_height=100,
        sample_outside=100.0, stratified_depths=False,
    )
    vol = make_vessel_volume(res=96)
    ds = generate_dataset(vol, dcfg)
    import json

    for run_i in range(max(1, args.repeat)):
        res = train(cfg, ds.rays, src_pt_z=1500.0, verbose=True)
        print(
            f"RESULT best_vessel_psnr={res.best_psnr:.2f} at iter {res.best_iter}; "
            f"last_psnr={res.last_psnr:.2f}; {res.rays_per_sec:.0f} rays/s "
            f"(march={cfg.march_mode}, mlp={cfg.mlp_backend})"
        )
        row = {
            "seed": cfg.seed,
            "sampling": cfg.sampling_impl,
            "jitter": cfg.grid_jitter,
            "carve": cfg.carve_init,
            "engage_max": cfg.compact_engage_max,
            "hybrid_split": cfg.hybrid_split,
            "bucket_k": cfg.hybrid_bucket_k,
            "fka": cfg.march_fka,
            "iters": args.iters,
            "heldout_psnr": round(res.last_psnr, 3),
            "heldout_at_best_ckpt": round(res.best_heldout_psnr, 3),
            "vessel_psnr_best": round(res.best_psnr, 3),
            "rays_per_sec": round(res.rays_per_sec),
            "warm": run_i > 0,
            "timing": {k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in res.timing.items()},
        }
        if args.tag:
            row["tag"] = args.tag
        print("RESULT_JSON " + json.dumps(row))
        # persist in-repo so a container restart can't lose the row (the
        # queue11/12 RESULT_JSON lines lived only in /tmp logs and were
        # wiped with the session)
        rows_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "quality_runs_r5.jsonl",
        )
        try:
            with open(rows_path, "a") as f:
                f.write(json.dumps(row) + "\n")
        except OSError as e:
            print(f"WARNING: could not persist result row: {e}")


if __name__ == "__main__":
    main()
