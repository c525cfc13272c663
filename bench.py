"""Benchmark: RFN 16-frame autoregressive rollout, frames/sec/chip.

The headline number from BASELINE.md: KTH-protocol rollouts (64x64 gray,
predict 16 frames) on TPU vs the measured PyTorch reference. The reference
publishes no numbers, so the baseline is MEASURED by running the reference
model (same architecture config) with CPU torch once and caching it in
BENCH_BASELINE.json (hardware noted inside). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

BENCH = dict(
    image_size=64,
    channels=1,
    batch_size=8,
    n_conditions=3,
    n_predictions=16,
    h_dim=128,
    z_dim=16,
    a_dim=32,
    L=3,
    K=10,
    n_units_affine=256,
    n_units_prior=256,
    extractor=((32, "pool", 64), (64, "pool", 128), (128, "pool", 128)),
    upscaler=((128, 64), ("upsample", 64, 64), ("upsample", 32, 32)),
    prior_structure=(128, 64),
    encoder_structure=(128, 64),
)

_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_BASELINE.json")


def measure_ours() -> float:
    import jax

    from recurrent_flows_tpu.utils.compilation_cache import enable as _cache

    _cache()

    from recurrent_flows_tpu.config import GlowConfig, RFNConfig
    from recurrent_flows_tpu.models import RFN

    b = BENCH
    cfg = RFNConfig(
        x_channels=b["channels"],
        image_size=b["image_size"],
        h_dim=b["h_dim"],
        z_dim=b["z_dim"],
        a_dim=b["a_dim"],
        L=b["L"],
        K=b["K"],
        extractor_structure=b["extractor"],
        upscaler_structure=b["upscaler"],
        prior_structure=b["prior_structure"],
        encoder_structure=b["encoder_structure"],
        norm_type="none",
        norm_type_features="none",
        glow=GlowConfig(L=b["L"], K=b["K"], n_units_affine=b["n_units_affine"],
                        n_units_prior=b["n_units_prior"]),
    )
    # f32 + XLA fusion; bf16 compute_dtype re-measured at PARITY with f32
    # on this rollout (21.7 vs 21.1 ms, scripts/bench_rollout_ab.py) — the
    # path is op-count-bound, so dtype doesn't move it. f32 stays default.
    model = RFN(cfg, remat=False)
    bs = b["batch_size"]
    x = (
        jax.random.uniform(
            jax.random.key(0), (bs, b["n_conditions"], b["image_size"], b["image_size"], 1)
        )
        - 0.5
    )
    variables = model.init(jax.random.key(1), x, jax.random.key(2))

    @jax.jit
    def rollout(v, x, key):
        _, preds = model.apply(v, x, b["n_predictions"], b["n_conditions"], key,
                               method="predict")
        return preds

    # compiled-cost introspection: achieved FLOP/s for the headline
    try:
        lowered = rollout.lower(variables, x, jax.random.key(3))
        cost = lowered.compile().cost_analysis()
        measure_ours.rollout_flops = float(cost.get("flops", 0.0))
    except Exception:
        measure_ours.rollout_flops = 0.0

    # DEVICE-SIDE timing (round 3, VALIDATED methodology). Two hard-won
    # facts about this axon tunnel backend (scripts/probe_rollout_timing.py):
    #   1. block_until_ready() is a NO-OP: a full rollout "dispatch+block"
    #      returns in 0.7 ms while the device needs ~20 ms. Rounds 1-2's
    #      async-dispatch headline (120-170k f/s) measured the host's
    #      ENQUEUE rate, not compute. Results must be fetched BY VALUE.
    #   2. One value-fetch includes a ~40 ms link constant, comparable to
    #      the device time itself.
    # So the headline is the SLOPE of wall(R) = a + b*R where each trial
    # runs R rollouts inside one lax.fori_loop and fetches the scalar sum:
    # b is pure device ms/rollout, the link constant lands in a. Probe fit
    # (R in {1,2,5,10,20}): a=39.5 ms, b=20.52 ms, R^2 ~ 1.
    import jax.numpy as jnp

    def make_loop(R):
        @jax.jit
        def rollout_loop(v, x, key):
            def body(i, acc):
                preds = model.apply(
                    v, x, b["n_predictions"], b["n_conditions"],
                    jax.random.fold_in(key, i), method="predict")[1]
                return acc + jnp.sum(preds)

            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        return rollout_loop

    frames = bs * b["n_predictions"]
    R_LO, R_HI = 2, 12

    def _slope_trials():
        loops = {R: make_loop(R) for R in (R_LO, R_HI)}
        ms = {R: [] for R in (R_LO, R_HI)}
        for R, loop in loops.items():
            val = float(loop(variables, x, jax.random.key(3)))  # compile
            if val != val:
                raise RuntimeError("device loop produced NaN")
        for trial in range(9):
            for R, loop in loops.items():
                t0 = time.perf_counter()
                float(loop(variables, x, jax.random.key(100 + trial)))
                ms[R].append((time.perf_counter() - t0) * 1000.0)
        trials = []
        for lo, hi in zip(ms[R_LO], ms[R_HI]):
            slope = (hi - lo) / (R_HI - R_LO)  # device ms/rollout
            if slope <= 0:
                continue  # link stall in the lo trial; drop the pair
            trials.append(frames / slope * 1000.0)
        if len(trials) < 5:
            raise RuntimeError("too many degenerate slope pairs")
        link_ms = sorted(
            lo - (hi - lo) / (R_HI - R_LO) * R_LO
            for lo, hi in zip(ms[R_LO], ms[R_HI])
        )[len(ms[R_LO]) // 2]
        measure_ours.link_const_ms = round(link_ms, 1)
        flops = measure_ours.rollout_flops
        if flops:
            implied_tflops = flops * max(trials) / frames / 1e12
            if implied_tflops > 2 * 98.5:  # >2x nominal f32 peak: not real
                raise RuntimeError(
                    f"slope timing implausible ({implied_tflops:.0f} "
                    "TFLOP/s); falling back to serial value-fetch")
        return trials, (
            f"device-side slope: wall(R)=a+b*R over R={R_LO},{R_HI} "
            "rollouts per lax.fori_loop dispatch, scalar fetched by value; "
            "fps = frames/b (link constant a excluded)")

    def _serial_fetch_trials():
        """Fallback: one rollout per trial, result fetched by value. The
        ~40 ms link constant is INCLUDED, so this UNDERSTATES device
        throughput — honest lower bound, never inflated."""
        p = rollout(variables, x, jax.random.key(3))
        float(jnp.sum(p))  # compile + sync
        trials = []
        for trial in range(9):
            t0 = time.perf_counter()
            float(jnp.sum(rollout(variables, x, jax.random.key(100 + trial))))
            trials.append(frames / (time.perf_counter() - t0))
        return trials, ("serial value-fetch per rollout (link constant "
                        "included; lower bound)")

    measure_ours.link_const_ms = None
    try:
        fps_trials, method = _slope_trials()
    except Exception as e:
        print(f"# slope timing unavailable: {e}", flush=True)
        fps_trials, method = _serial_fetch_trials()

    # documented outlier-trim rule: a trial below 0.6x the best trial is a
    # link stall (SSH tunnel hiccup), not device behavior — drop it from
    # the median but keep it visible in trials_in_order
    ordered = list(fps_trials)
    best = max(fps_trials)
    kept = sorted(v for v in fps_trials if v >= 0.6 * best)
    q = lambda p: kept[min(int(p * len(kept)), len(kept) - 1)]
    measure_ours.dispersion = dict(
        method=method,
        trials_in_order=[round(v, 1) for v in ordered],
        n_trimmed_link_stalls=len(ordered) - len(kept),
        trim_rule="drop trials < 0.6x best",
        median=q(0.5),
        p25=q(0.25),
        p75=q(0.75),
        iqr_over_median=round((q(0.75) - q(0.25)) / q(0.5), 4),
        min=kept[0],
        max=kept[-1],
        link_const_ms=measure_ours.link_const_ms,
    )
    return q(0.5)


def measure_reference() -> float:
    """Measure the PyTorch reference's rollout on this host (CPU torch).

    Same architecture config; .cuda() monkeypatched to no-op since the
    reference hard-codes CUDA tensor placement (RFN/RFN_new.py:120 etc).
    """
    import sys
    from types import SimpleNamespace

    import numpy as np
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only host
    torch.set_num_threads(os.cpu_count() or 8)
    sys.path.insert(0, "/root/reference")
    from RFN.RFN_new import RFN as RefRFN

    b = BENCH
    bs = b["batch_size"]
    args = SimpleNamespace(
        batch_size=bs,
        x_dim=[bs, b["channels"], b["image_size"], b["image_size"]],
        condition_dim=[bs, b["channels"], b["image_size"], b["image_size"]],
        h_dim=b["h_dim"],
        z_dim=b["z_dim"],
        a_dim=b["a_dim"],
        L=b["L"],
        K=b["K"],
        norm_type="none",
        norm_type_features="none",
        temperature=0.7,
        prior_structure=list(b["prior_structure"]),
        encoder_structure=list(b["encoder_structure"]),
        free_bits=-1.0,
        skip_connection_flow="with_skip",
        downscaler_tanh=False,
        skip_connection_features=True,
        upscaler_tanh=False,
        enable_smoothing=False,
        res_q=False,
        D=0,
        overshot_w=1.0,
        extractor_structure=[list(s) for s in b["extractor"]],
        upscaler_structure=[list(s) for s in b["upscaler"]],
        structure_scaler=2,
        learn_prior=True,
        LU_decomposed=True,
        n_units_affine=b["n_units_affine"],
        non_lin_glow="relu",
        n_units_prior=b["n_units_prior"],
        make_conditional=True,
        flow_norm="actnorm",
        base_norm="actnorm",
        flow_batchnorm_momentum=0.0,
        clamp_type="realnvp",
        split2d_act="softplus",
        n_bits=8,
    )
    model = RefRFN(args)
    model.eval()
    x = torch.rand(bs, b["n_conditions"], b["channels"], b["image_size"], b["image_size"]) - 0.5
    with torch.no_grad():
        model.predict(x, 1, b["n_conditions"])  # warmup
        t0 = time.perf_counter()
        model.predict(x, b["n_predictions"], b["n_conditions"])
        dt = time.perf_counter() - t0
    return bs * b["n_predictions"] / dt


def get_baseline() -> float:
    if os.path.exists(_BASELINE_FILE):
        with open(_BASELINE_FILE) as f:
            return json.load(f)["torch_reference_fps"]
    try:
        fps = measure_reference()
        with open(_BASELINE_FILE, "w") as f:
            json.dump(
                dict(
                    torch_reference_fps=fps,
                    note="PyTorch reference RFN.predict, CPU torch on bench host "
                    "(reference hardware V100 unavailable; reference publishes "
                    "no numbers — BASELINE.md)",
                    config=str(BENCH),
                ),
                f,
                indent=2,
            )
        return fps
    except Exception as e:  # pragma: no cover
        print(f"# baseline measurement failed: {e}", flush=True)
        return float("nan")


def measure_train_step() -> dict:
    """Secondary: full RFN train-step throughput (fused on-device data gen +
    loss + grad + adam) on a 64x64 config."""
    import jax

    from recurrent_flows_tpu.config import GlowConfig, RFNConfig, TrainConfig
    from recurrent_flows_tpu.data import MovingMNIST
    from recurrent_flows_tpu.models import RFN
    from recurrent_flows_tpu.training import Trainer

    b = BENCH
    cfg = RFNConfig(
        x_channels=1,
        image_size=b["image_size"],
        h_dim=b["h_dim"],
        z_dim=b["z_dim"],
        a_dim=b["a_dim"],
        L=b["L"],
        K=b["K"],
        extractor_structure=b["extractor"],
        upscaler_structure=b["upscaler"],
        prior_structure=b["prior_structure"],
        encoder_structure=b["encoder_structure"],
        norm_type="none",
        norm_type_features="none",
        glow=GlowConfig(L=b["L"], K=b["K"], n_units_affine=b["n_units_affine"],
                        n_units_prior=b["n_units_prior"]),
    )
    tcfg = TrainConfig(batch_size=16, n_frames=6, beta_steps=100)
    ds = MovingMNIST(seq_len=6, image_size=b["image_size"],
                     digit_size=b["image_size"] // 2, num_digits=1)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        tr = Trainer(RFN(cfg), tcfg, ds, tmp).build(run_ddi=False)
        tr.train_epoch(steps=3)  # compile + warmup
        t0 = time.perf_counter()
        tr.train_epoch(steps=40)
        wall = time.perf_counter() - t0
    frames = tcfg.batch_size * (tcfg.n_frames - 1)
    return dict(
        steps_per_s=40.0 / wall,
        train_frames_per_s=frames * 40.0 / wall,
        wall_s=wall,
    )


# nominal f32 MXU peak for one v5e chip (197 bf16 TFLOP/s / 2); XLA mixes
# bf16 MXU passes under default precision so >100% is possible
V5E_F32_PEAK_TFLOPS = 98.5
V5E_HBM_GBPS = 819.0


def _scripts_on_path():
    import sys as _sys

    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
    if p not in _sys.path:
        _sys.path.insert(0, p)


def measure_prod_step() -> dict:
    """Thesis-config (L=5, 36M params) loss+grad step: ms, TFLOP/s, and %
    of its own op-mix roofline (max of MXU time and HBM time from the
    compiled cost analysis) — round-3 verdict weak #5: this line must ride
    in the driver-recorded bench JSON, not only BENCH_DETAILS.

    Round-4 verdict weak #1: the +4.1% save_flow_x remat claim did not
    reproduce across sessions (~4% link drift), so BOTH policies are now
    timed here in ONE process with interleaved blocks (bench_prodstep.
    ab_step) and the pair + delta ride in the driver line every round."""
    _scripts_on_path()
    from bench_prodstep import ab_step, time_step as _prod_time

    ab = ab_step("auto", runs=16, base_kw=dict(remat_policy=None),
                 var_kw=dict(remat_policy="save_flow_x"), blocks=4)
    dt = ab["b_ms"] / 1000.0  # the shipping default (save_flow_x)
    p_flops = getattr(_prod_time, "flops", 0.0)
    p_bytes = getattr(_prod_time, "bytes", 0.0)
    p_tflops = p_flops / dt / 1e12 if p_flops else None
    out = dict(loss_grad_ms=round(dt * 1000, 2),
               steps_per_s=round(1.0 / dt, 2),
               remat_ab=dict(plain_remat_ms=ab["a_ms"],
                             save_flow_x_ms=ab["b_ms"],
                             save_flow_x_gain_pct=ab["delta_pct"],
                             blocks_plain=ab["a_blocks"],
                             blocks_save_flow_x=ab["b_blocks"],
                             method="interleaved in-session blocks, "
                                    "median-of-4"),
               flops_per_step=p_flops,
               tflops_per_s=round(p_tflops, 2) if p_tflops else None,
               pct_of_f32_peak=round(100 * p_tflops / V5E_F32_PEAK_TFLOPS, 1)
               if p_tflops else None)
    if p_flops and p_bytes:
        roof_ms = max(p_flops / 1e9 / V5E_F32_PEAK_TFLOPS,
                      p_bytes / 1e9 / (V5E_HBM_GBPS / 1000.0))
        out["roofline_ms"] = round(roof_ms, 2)
        out["pct_of_roofline"] = round(100 * roof_ms / (dt * 1000), 1)
    return out


def measure_serving() -> dict:
    """Interactive serving latency: B=1 production-config autoregressive
    rollout (predict 10 from 5), ms per generated frame, with per-trial
    dispersion under the validated chained-dispatch timing (round-3
    verdict next #7: tracked round-over-round, not a one-off PERF note)."""
    _scripts_on_path()
    from bench_prodstep import time_sample as _sample_time

    trials = []
    for _ in range(5):
        dt = _sample_time("auto", runs=10, batch=1)
        trials.append(dt * 1000.0 / 10.0)  # ms per predicted frame
    kept = sorted(trials)
    return dict(ms_per_frame=round(kept[len(kept) // 2], 3),
                trials_ms_per_frame=[round(v, 3) for v in trials],
                min=round(kept[0], 3), max=round(kept[-1], 3),
                batch=1, n_predictions=10,
                method=("chained in-jit dispatches (10 rollouts/fetch), "
                        "value fetch; link constant amortized"))


_STAGE_PREFIX = "STAGE_JSON:"


def run_stage(name: str) -> dict:
    """Child-process entry: run ONE measurement and print its JSON as the
    last stdout line (prefixed so the orchestrator can find it among
    warnings). Stages run in subprocesses because a wedged axon-tunnel
    RPC blocks C-side with the GIL parked (observed twice round 5:
    36 min stalls with ~2 min CPU) — only killing the process recovers,
    and a FRESH process then succeeds; in-process SIGALRM is not enough."""
    if name == "rollout":
        fps = measure_ours()
        out = dict(value=fps,
                   dispersion=getattr(measure_ours, "dispersion", None),
                   rollout_flops=getattr(measure_ours, "rollout_flops", 0.0))
    elif name == "prod":
        out = measure_prod_step()
    elif name == "serving":
        out = measure_serving()
    elif name == "train_step":
        out = measure_train_step()
    else:
        raise SystemExit(f"unknown stage {name}")
    print(_STAGE_PREFIX + json.dumps(out), flush=True)


def _call_stage(name: str, timeout_s: int, attempts: int = 2) -> dict:
    """Orchestrator side: run a stage in a subprocess with a hard timeout
    and one fresh-process retry. Returns the stage dict or {'error': ...}.
    Sets _call_stage.last_timed_out so the orchestrator can fast-fail the
    remaining TPU stages once the backend looks wedged."""
    import subprocess
    import sys

    _call_stage.last_timed_out = False
    err = "unknown"
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                timeout=timeout_s, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            err = f"stage '{name}' exceeded {timeout_s}s (attempt {attempt + 1})"
            print(f"# {err}; killed subprocess", flush=True)
            _call_stage.last_timed_out = True
            continue
        _call_stage.last_timed_out = False
        for ln in reversed(r.stdout.splitlines()):
            if ln.startswith(_STAGE_PREFIX):
                return json.loads(ln[len(_STAGE_PREFIX):])
        err = (f"stage '{name}' rc={r.returncode}, no result line; "
               f"stderr tail: {r.stderr[-300:]}")
        print(f"# {err}", flush=True)
    return dict(error=err)


def main():
    # Global deadline: tunnel compiles are wildly variable (5m41s to
    # ~18 min PER PROGRAM observed for the same stages, round 5), so the
    # stage cascade must not outrun the driver's budget. The primary
    # rollout line always runs; later stages are skipped once the
    # deadline minus their timeout is gone. Warm persistent-cache runs
    # (the realistic driver scenario) finish all stages in ~10 min.
    t0 = time.time()
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", 2100))

    def over_budget(stage_timeout_s: int) -> bool:
        return time.time() - t0 > deadline_s - stage_timeout_s

    baseline = get_baseline()
    # every TPU stage runs in its own killable subprocess (see run_stage);
    # two consecutive stage timeouts = the tunnel is wedged -> emit the
    # driver line immediately with error fields instead of burning the
    # whole budget
    roll = _call_stage("rollout", 540)
    wedged = _call_stage.last_timed_out and "error" in roll
    ours = roll.get("value") or float("nan")
    measure_ours.dispersion = roll.get("dispersion")
    flops = roll.get("rollout_flops") or 0.0
    vs = (ours / baseline
          if ours == ours and baseline == baseline and baseline > 0 else 0.0)
    frames = BENCH["batch_size"] * BENCH["n_predictions"]
    tflops = flops * ours / frames / 1e12 if flops and ours == ours else None
    if wedged:
        prod = dict(error="skipped: backend wedged (rollout stage timed out "
                          "twice)")
        serving = dict(error="skipped: backend wedged")
    elif over_budget(1080):
        prod = dict(error="skipped: global deadline")
        serving = dict(error="skipped: global deadline")
    else:
        prod = _call_stage("prod", 1080)
        if _call_stage.last_timed_out and "error" in prod:
            serving = dict(error="skipped: backend wedged (prod stage timed "
                                 "out twice)")
        elif over_budget(720):
            serving = dict(error="skipped: global deadline")
        else:
            serving = _call_stage("serving", 720)
    # value = median device-side slope fps (validated by value fetch; see
    # measure_ours). NOTE r01/r02 recorded 120-170k f/s with an
    # async-dispatch method that round 3 proved measures host enqueue rate,
    # not compute (block_until_ready is a no-op on this backend) — those
    # numbers are NOT comparable.
    print(
        json.dumps(
            dict(
                metric="rfn_rollout_frames_per_sec_per_chip",
                value=round(ours, 2) if ours == ours else None,
                rollout_error=roll.get("error"),
                unit="frames/s",
                vs_baseline=round(vs, 2),
                tflops_per_s=round(tflops, 2) if tflops else None,
                pct_of_f32_peak=round(100 * tflops / V5E_F32_PEAK_TFLOPS, 1)
                if tflops else None,
                train_step=prod,
                serving=serving,
                note=("vs_baseline is vs CPU torch on the bench host "
                      "(reference V100 unavailable, publishes no numbers); "
                      "r01/r02 values (120-170k) retracted as host-enqueue "
                      "artifacts (docs/PERF.md round-3 correction)"),
                dispersion=getattr(measure_ours, "dispersion", None),
            )
        ),
        flush=True,
    )
    # post-print block: BENCH_r04 recorded rc=124 because this ran with no
    # time bound after the driver line; it now runs as a killable
    # subprocess stage (one attempt) so the process always exits 0
    if wedged or (_call_stage.last_timed_out and "error" in serving):
        tstep = dict(error="skipped: backend wedged")
    elif over_budget(420):
        tstep = dict(error="skipped: global deadline")
    else:
        tstep = _call_stage("train_step", 420, attempts=1)
    try:
        details = dict(train_step=tstep,
                       prod_loss_grad=prod,
                       serving=serving,
                       rollout_frames_per_s=ours,
                       rollout_dispersion=getattr(measure_ours, "dispersion", None),
                       rollout_flops=flops,
                       rollout_tflops_per_s=round(tflops, 3) if tflops else None,
                       f32_peak_assumed_tflops=V5E_F32_PEAK_TFLOPS,
                       torch_reference_rollout_fps=baseline)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAILS.json"), "w") as f:
            json.dump(details, f, indent=2)
    except Exception as e:  # secondary metrics must not break the bench line
        print(f"# train-step bench failed: {e}")


def _backend_reachable(timeout_s: int = 180) -> bool:
    """Fast-fail probe: the axon tunnel's backend init BLOCKS ~20 min when
    the link is down (observed round 3), which would hang the whole bench.
    Probe device liveness in a subprocess with a hard timeout instead."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) >= 3 and _sys.argv[1] == "--stage":
        # child invocation from _call_stage; parent already probed liveness
        run_stage(_sys.argv[2])
        raise SystemExit(0)
    if not _backend_reachable():
        print(json.dumps(dict(
            metric="rfn_rollout_frames_per_sec_per_chip", value=None,
            unit="frames/s", vs_baseline=None,
            error="TPU backend unreachable (axon tunnel down); last good "
                  "measurement is in BENCH_DETAILS.json")), flush=True)
        raise SystemExit(0)
    main()
