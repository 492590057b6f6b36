"""Extraction throughput benchmark — the repo's headline perf metric.

Measures images/sec/chip for the full flagship extraction program
(ResUNet-50 + KeypointDet forward, NMS + top-k + 3×3 refinement,
descriptor sampling) at 480×640 — the reference's standard resolution.

Methodology: the axon TPU relay dispatches asynchronously and
block_until_ready does not synchronize, so timing is done by running
N_SCAN extraction steps inside ONE jitted lax.scan and fetching a scalar
that depends on every step — a single host round-trip (~20 ms) amortized
over N_SCAN×batch images.

Robustness: the axon relay can be transiently (or durably) unavailable,
and a dead relay HANGS backend init rather than erroring. Before
importing jax in this process, a subprocess probe (bounded timeout)
checks the backend, retrying with exponential backoff up to
POSFEAT_BENCH_RETRY_SECS (default 1800 s; 0 disables retries). If the
backend never comes up, ONE parseable JSON line is still printed (value
0.0 + an "error" field) so a flaky minute at capture time degrades the
artifact instead of zeroing it with a stack trace.

Baseline: the reference PyTorch pipeline on an RTX 3090 (BASELINE.md).
The repo publishes no throughput number; 25 images/s is our estimate for
batch-1 ResNet-50-UNet + full-res head inference at 640×480 on a 3090,
used as the comparison denominator (vs_baseline = ours / 25).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", plus
diagnostics: per-config results, the active fast-path gate set, backend}.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_IMAGES_PER_SEC = 25.0
# resolution/budget overrides for scaling studies (defaults = the
# reference's standard 480x640 @ 8192 pts; e.g. POSFEAT_BENCH_HW=960,1280
# POSFEAT_BENCH_NPTS=20480 for the Aachen-class operating point)
_hw = os.environ.get("POSFEAT_BENCH_HW", "480,640").split(",")
H, W = int(_hw[0]), int(_hw[1])
NUM_PTS = int(os.environ.get("POSFEAT_BENCH_NPTS", "8192"))


def probe_backend(total_budget_s: float, probe_timeout_s: float = 240.0):
    """Check backend health in a SUBPROCESS (a dead axon relay hangs
    jax device init — a timeout is the only safe failure detector).
    Retries with exponential backoff until the budget runs out.

    Returns (backend_name | None, seconds_spent, last_error_string).
    """
    deadline = time.monotonic() + total_budget_s
    delay = 30.0
    last_err = ""
    attempt = 0
    while True:
        attempt += 1
        t0 = time.monotonic()
        try:
            out = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    # mirror posfeat_tpu/__init__.py's platform override
                    # (the site hook sets jax_platforms programmatically,
                    # so plain env JAX_PLATFORMS is ignored)
                    "import os, jax;\n"
                    "p = os.environ.get('POSFEAT_PLATFORM')\n"
                    "if p: jax.config.update('jax_platforms', p)\n"
                    "import jax.numpy as jnp\n"
                    "x = jnp.ones((8, 8)) @ jnp.ones((8, 8))\n"
                    "x.block_until_ready()\n"
                    "print(jax.default_backend())",
                ],
                capture_output=True,
                text=True,
                timeout=probe_timeout_s,
            )
            if out.returncode == 0 and out.stdout.strip():
                return out.stdout.strip().splitlines()[-1], time.monotonic() - t0, ""
            last_err = (out.stderr or "").strip().splitlines()[-1:] or ["rc!=0"]
            last_err = last_err[0][:300]
        except subprocess.TimeoutExpired:
            last_err = f"backend probe hung >{probe_timeout_s:.0f}s"
        print(
            f"# backend probe attempt {attempt} failed: {last_err}",
            file=sys.stderr,
        )
        if time.monotonic() + delay > deadline:
            return None, 0.0, last_err
        time.sleep(delay)
        delay = min(delay * 2, 300.0)


def build_extract(model, num_pts=NUM_PTS):
    from posfeat_tpu.ops.coords import denormalize_coords
    from posfeat_tpu.ops.detect import generate_kpts_single
    from posfeat_tpu.ops.grid_sample import sample_feat_by_coord

    def extract(variables, im):
        outputs = model.extract(variables, im, train=False)
        coord_n, score, valid = generate_kpts_single(
            outputs["local_point"],
            num_pts=num_pts,
            nms_radius=1,
            use_nms=True,
            thr=0.9,
            thr_mod="abs",
        )
        feat = sample_feat_by_coord(outputs["local_map"], coord_n, norm=True)
        coords = denormalize_coords(coord_n, H, W)
        return coords, score, feat, valid

    return extract


def bench_extraction(batch_size: int, dtype, n_scan: int = 8):
    import copy

    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_MODEL_CONFIG
    from posfeat_tpu.models import PoSFeat

    cfg = copy.deepcopy(FLAGSHIP_MODEL_CONFIG)
    # default: the fused Pallas head for bf16 (fastest, forward-only);
    # override with POSFEAT_BENCH_HEAD=always|phase|false
    head_mode = os.environ.get(
        "POSFEAT_BENCH_HEAD", "pallas" if dtype == jnp.bfloat16 else ""
    )
    if head_mode:
        cfg["localheader_config"]["fused_upsample"] = (
            False if head_mode == "false" else head_mode
        )
    model = PoSFeat(cfg, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), im_shape=(1, 64, 64, 3))
    extract = build_extract(model)

    @jax.jit
    def run(variables, ims):
        def body(carry, im):
            coords, score, feat, valid = extract(variables, im)
            contrib = (
                jnp.sum(coords.astype(jnp.float32))
                + jnp.sum(feat[:, :8].astype(jnp.float32))
                + jnp.sum(valid)
            )
            return carry + contrib, None

        acc, _ = jax.lax.scan(body, 0.0, ims)
        return acc

    rng = np.random.RandomState(0)
    ims = jnp.asarray(
        rng.rand(n_scan, batch_size, H, W, 3).astype(np.float32)
    )

    # warmup: includes (possibly slow remote) compile; fetch forces full
    # execution
    v = float(run(variables, ims))
    assert np.isfinite(v)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(run(variables, ims))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return n_scan * batch_size / dt


def active_gates():
    """Snapshot of the fast-path/numerics knobs in force — recorded in
    the bench JSON so every number is attributable to a configuration."""
    from posfeat_tpu.core.knobs import trace_knob_key

    return dict(trace_knob_key())


def emit(value, results, backend, error="", headline_config="", gates=None):
    rec = {
        "metric": "images_per_sec_per_chip_640px_extraction",
        "value": round(value, 3),
        "unit": "im/s",
        "vs_baseline": round(value / BASELINE_IMAGES_PER_SEC, 3),
        "backend": backend,
        "configs": {k: round(v, 2) for k, v in results.items()},
        # the gate set IN FORCE for the headline config (the per-config
        # envs are applied temporarily, so a process-level snapshot at
        # emit time would read empty)
        "gates": active_gates() if gates is None else gates,
    }
    if headline_config:
        rec["headline_config"] = headline_config
    if (H, W) != (480, 640) or NUM_PTS != 8192:
        rec["hw"] = f"{H}x{W}"
        rec["num_pts"] = NUM_PTS
    if error:
        rec["error"] = error
    print(json.dumps(rec))


def main():
    budget = float(os.environ.get("POSFEAT_BENCH_RETRY_SECS", "1800"))
    if budget > 0:
        backend, _, err = probe_backend(budget)
        if backend is None:
            emit(0.0, {}, "unavailable", error=f"backend never came up: {err}")
            return
    # backend healthy (or retries disabled) — import jax in-process now
    import jax
    import jax.numpy as jnp

    from posfeat_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    backend = jax.default_backend()
    results = {}
    # The headline must be a config that ALSO satisfies the 0.5% MMA
    # parity budget (BASELINE.md): f32 is exact, and bf16 is in-budget
    # only with the split3 descriptor tail (ΔMMA −0.0040, PROOFS.md).
    # "ship" adds split3 + the gates measured ΔMMA-neutral on the CPU
    # probes and exact-by-construction sampling (ring/approx −0.0001,
    # pair exact); the Mosaic-hazard im2col gate stays out until
    # kp_parity2 passes on device (runbook step 01).
    SHIP_ENV = {
        "POSFEAT_DESC_TAIL_F32": "split3",
        "POSFEAT_SAMPLE_IMPL": "quad",
        "POSFEAT_TOPK": "approx",
        "POSFEAT_HEAD_RING": "0",
        "POSFEAT_HEAD_IM2COL": "1",
    }
    # "lite" = the gates without the split3 descriptor tail. Quality
    # evidence (PROOFS.md): score-f32 (default-on) alone restores
    # parity-level ΔMMA at the 480x640/8192-pt operating point
    # (+0.0010); split3 additionally covers the descriptor-rounding
    # term the amplified 96x128 fixture exposes (−0.0078 → −0.0040).
    # im2col joined 2026-08-19 after its device gate cleared: the
    # out_ch=2 tail fix compiles on real Mosaic, kernel-level im2col
    # matches v3 to 0.0037 max / 0.000000 mean, and the full-model
    # score maps are identical to v3's (runbook 53_parity_outch_fix).
    LITE_ENV = {k: v for k, v in SHIP_ENV.items()
                if k != "POSFEAT_DESC_TAIL_F32"}
    # (name, batch, dtype, extra_env, headline_eligible). Each TPU
    # config is a ~5-12 min remote compile; "1:f32" (bs-1 latency,
    # 30.3 im/s in BENCH_r01) and the raw-bf16 diagnostic are
    # selectable but not in the default sweep to keep the driver's
    # capture inside its budget.
    configs = [
        ("1:f32", 1, jnp.float32, None, True),
        ("1:bf16", 1, jnp.bfloat16, None, False),  # latency diagnostic
        ("16:f32", 16, jnp.float32, None, True),  # exact mode at batch
        ("16:bf16", 16, jnp.bfloat16, None, False),  # raw diagnostic
        ("32:bf16", 32, jnp.bfloat16, None, False),  # raw diagnostic
        ("64:bf16", 64, jnp.bfloat16, None, False),  # raw diagnostic
        ("16:bf16:lite", 16, jnp.bfloat16, LITE_ENV, True),
        ("32:bf16:lite", 32, jnp.bfloat16, LITE_ENV, True),
        ("64:bf16:lite", 64, jnp.bfloat16, LITE_ENV, True),
        ("16:bf16:ship", 16, jnp.bfloat16, SHIP_ENV, True),
        ("32:bf16:ship", 32, jnp.bfloat16, SHIP_ENV, True),
    ]
    # default sweep = the two certified lite configs (the shipping gate
    # set; 255-259 im/s with ΔMMA −0.0005, PROOFS.md 2026-08-19). The
    # ship (split3) margin variants are already device-measured
    # (189.4/193.3 im/s, RUNBOOK_EVIDENCE step 96 final-tree dress
    # rehearsal) and stay selectable — each skipped config saves
    # the driver's capture a ~5-12 min cold-cache remote compile.
    default_skip = {
        "1:f32", "1:bf16", "16:f32", "16:bf16", "32:bf16", "64:bf16",
        "64:bf16:lite", "16:bf16:ship", "32:bf16:ship",
    }
    if backend == "cpu":  # keep CI fast
        configs = [("1:f32", 1, jnp.float32, None, True)]
        default_skip = set()
    # A/B experiments: restrict to a subset, e.g. POSFEAT_BENCH_CONFIGS=
    # "16:bf16,32:bf16:ship" — each env-gated variant is a fresh remote
    # compile (~5-12 min on the axon relay), so measuring one batch size
    # at a time matters
    sel = os.environ.get("POSFEAT_BENCH_CONFIGS")
    if sel:
        want = {w.strip() for w in sel.split(",")}
        configs = [c for c in configs if c[0] in want]
        if not configs:
            print(
                f"POSFEAT_BENCH_CONFIGS={sel!r} matches no config on the "
                f"{backend} backend — nothing to measure",
                file=sys.stderr,
            )
            sys.exit(2)
    else:
        configs = [c for c in configs if c[0] not in default_skip]
    last_err = ""
    shippable = {}
    config_gates = {}
    # A/B gate overrides on top of a named config's gate set, e.g.
    # POSFEAT_BENCH_GATE_OVERRIDES="POSFEAT_SAMPLE_IMPL=quad" — plain
    # env vars can't do this because each config SETS its gates
    overrides = dict(
        kv.split("=", 1)
        for kv in os.environ.get(
            "POSFEAT_BENCH_GATE_OVERRIDES", ""
        ).split(",")
        if "=" in kv
    )
    for name, bs, dt, extra_env, eligible in configs:
        saved = {}
        for k, v in {**(extra_env or {}), **overrides}.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        config_gates[name] = active_gates()
        try:
            # transient relay faults (broken pipe on large compiles) get
            # one bounded retry per config before moving on
            for attempt in (1, 2):
                try:
                    ips = bench_extraction(
                        bs, dt, n_scan=2 if backend == "cpu" else 16
                    )
                    results[name] = ips
                    if eligible:
                        shippable[name] = ips
                    print(
                        f"# extraction {name}: {ips:.2f} im/s",
                        file=sys.stderr,
                    )
                    break
                except Exception as e:  # noqa: BLE001
                    last_err = f"{name}: {e}"
                    print(
                        f"# bench {name} attempt {attempt} failed: {e}",
                        file=sys.stderr,
                    )
                    if attempt == 1:
                        time.sleep(30)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    # headline: best config that also holds the quality budget. With an
    # EXPLICIT POSFEAT_BENCH_CONFIGS selection (A/B use) the caller
    # asked for those configs, so the headline is the best of them; on
    # the default sweep an out-of-budget raw config must NOT become the
    # headline — if every eligible config failed, emit 0 + error.
    pool = (results if sel else shippable)
    best_name = max(pool, key=pool.get) if pool else ""
    best = pool[best_name] if pool else 0.0
    err = ""
    if not results:
        err = last_err[:300]
    elif not pool:
        err = f"no quality-eligible config succeeded; last: {last_err[:200]}"
    emit(best, results, backend, error=err, headline_config=best_name,
         gates=config_gates.get(best_name))


if __name__ == "__main__":
    main()
