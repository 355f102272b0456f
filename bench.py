"""Throughput benchmark suite: serving + training configurations, one JSON line.

The headline metric is the flagship multimodal pipeline (BASELINE config #4:
[B,2,250,480] diffraction + error matrix -> masked 2x-SR pattern) at B=64
bfloat16 with the fused Pallas Swin-block kernels. The printed record also
carries a `records` list with the full matrix:

* full_b64_bf16      — headline serving throughput (images/sec/chip)
* full_b1_bf16       — single-image serving latency (ms/image)
* full_b8_fp32       — fp32 parity-precision config (the round-1 anchor shape)
* seg_only_b64_bf16  — segmentation-only BASELINE config #1 (SwinUNet)
* rl_full_b64_bf16   — RL alpha-policy pipeline, BASELINE config #5
* train_stage1_b4    — stage-1 supervised train step (fwd+bwd+masked-AdamW)
* train_stage3_odd_b4— stage-3 joint odd step (all three towers + update)
* train_stage1_b4_bf16 / train_stage3_odd_b4_bf16 — the same steps under
  mixed precision (bf16 compute, fp32 params/optimizer — the reference-AMP
  analog, Segmentator_pretrain.py:5,65,184-190)
* train_stage1_b4_loader_py / _loader_native — stage-1 fed fresh batches per
  step through the python ArrayLoader (inline gather+noise, the reference's
  single-threaded DataLoader analog) vs the C++ prefetching NativeBatcher
  (swinwnet_tpu/native/batcher.cpp) — measures host input-pipeline overlap
* full_b64_bf16_mesh — the headline pipeline sharded over ALL local devices
  via a 1-D data mesh (`--mesh` / SWINWNET_BENCH_MESH=1; records `devices`
  and per-chip img/s — trivially 1 device today, N when hardware exists)

Each record is measured over an adaptively-sized loop targeting >=30 s of
steady state (SWINWNET_BENCH_TARGET_S overrides; set 2 for smoke runs).
Serving iterations are serialized through a data dependency (each step's
input mixes in the previous output) and each timed loop ends with an
on-device scalar reduction fetched to the host — `block_until_ready` alone
under-reports on tunneled/experimental PJRT backends, while fetching a full
output tensor would bill a ~235 MB tunnel transfer to the timed region.
Training iterations chain through the optimizer state.

Serving mode: bfloat16 compute + chunked window attention (binarized masks
agree with fp32 on >99% of pixels — tests/test_modes.py). Training runs the
quality-run configuration (fp32 + per-block remat, batch 4 — the stage-3
joint backward exceeds 16 GB HBM without remat).

The reference publishes no wall-clock numbers (SURVEY.md §6), so the baseline
is this framework's first recorded measurement (BASELINE_IPS below);
vs_baseline tracks speedups across rounds. The persistent XLA compilation
cache (utils/compilation_cache.py) makes warm reruns compile-free.
"""

import json
import math
import os
import time

import numpy as np

# images/sec/chip of the first recorded round-1 fp32 run on a v5e chip
# (the anchor for vs_baseline across rounds — do not edit retroactively).
BASELINE_IPS = 11.2

TARGET_S = float(os.environ.get("SWINWNET_BENCH_TARGET_S", "30"))


def _steady_iters(probe_fn, target_s):
    """Run a 2-iteration probe and size the timed loop to >= target_s."""
    t0 = time.perf_counter()
    probe_fn(2)
    per_iter = (time.perf_counter() - t0) / 2
    return max(3, math.ceil(target_s / max(per_iter, 1e-9))), per_iter


def _bench_serving(step, variables, x, batch, target_s):
    """Chained serving loop; returns (img/s, iters, seconds)."""
    import jax  # noqa: F401

    y = step(variables, x)
    _ = float(y.sum())  # warmup + compile barrier

    def run(n):
        yy = step(variables, x)
        for _ in range(n - 1):
            yy = step(variables, yy)
        # completion barrier: reduce ON DEVICE and fetch 4 bytes. Fetching
        # the raw output (np.asarray) would drag the whole [B,2,H,W] tensor
        # through the tunnel inside the timed region — measured ~14 img/s
        # of phantom loss at B=64 (235 MB/fetch).
        _ = float(yy.sum())

    iters, _ = _steady_iters(run, target_s)
    t0 = time.perf_counter()
    run(iters)
    dt = time.perf_counter() - t0
    return batch * iters / dt, iters, dt


def _bench_training(step, state, images, masks, batch, target_s):
    """Training loop chained through the optimizer state."""
    s, _aux = step(state, images, masks)
    _ = float(np.asarray(s.step))  # warmup + compile barrier

    def run(n):
        ss = state
        for _ in range(n):
            ss, _ = step(ss, images, masks)
        _ = float(np.asarray(ss.step))

    iters, _ = _steady_iters(run, target_s)
    t0 = time.perf_counter()
    run(iters)
    dt = time.perf_counter() - t0
    return batch * iters / dt, iters, dt


def _cost_per_image(step, batch, *args):
    try:
        cost = step.lower(*args).compile().cost_analysis()
        if cost and cost.get("flops"):
            return float(cost["flops"]) / batch
    except Exception:  # cost analysis is best-effort on experimental backends
        pass
    return None


def _preflight(
    timeout_s: float = float(os.environ.get("SWINWNET_BENCH_PREFLIGHT_TIMEOUT_S", "240")),
):
    """Fail fast (clear JSON line, exit 3) when the device tunnel is down.

    A wedged TPU grant makes the first dispatch block forever; the round
    driver would then record a killed bench with no output. A trivial op on
    a worker thread bounds that wait and reports the condition instead."""
    import sys
    import threading

    result = {}
    # regression-test hook: simulate a wedged dispatch without real hardware
    hang_s = float(os.environ.get("SWINWNET_BENCH_PREFLIGHT_HANG_S", "0") or 0)

    def probe():
        try:
            if hang_s:
                time.sleep(hang_s)
            import jax.numpy as jnp

            x = jnp.ones((128, 128))
            result["ok"] = float((x @ x).sum()) == 128.0**3
        except Exception as e:  # noqa: BLE001 — report, don't crash the probe thread
            result["error"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if result.get("ok"):
        return
    import json as _json

    print(_json.dumps({
        "metric": "swinwnet_full_inference_throughput",
        "value": None,
        "unit": "images/sec/chip",
        # machine-readable marker: 'infra down', not 'bench crashed' (ADVICE r04)
        "infra_failure": True,
        # the standing hardware record if this round can't produce one
        "standing_record": {"run": "BENCH_r03 + PERFORMANCE.md round-5 campaign",
                            "value": 46.19, "unit": "images/sec/chip"},
        "error": result.get(
            "error", f"device unreachable: trivial matmul did not complete in {timeout_s:.0f}s"
        ),
        # don't touch jax.default_backend() here — backend init may be the
        # very thing that's hanging; the env var is hang-free
        "platform": os.environ.get("JAX_PLATFORMS", "default"),
    }))
    # The probe thread may still be wedged inside a PJRT dispatch; a normal
    # SystemExit would run interpreter teardown (C++ static destructors /
    # atexit of the runtime) underneath it, which throws and aborts with
    # rc 134 (BENCH_r04). Flush and leave without teardown so the driver
    # sees the intended clean exit 3.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(3)


def main():
    import jax
    import jax.numpy as jnp

    from swinwnet_tpu.models import SwinUNet, SwinWNet
    from swinwnet_tpu.pipelines.inference import inference_stages
    from swinwnet_tpu.utils import enable_persistent_cache

    _preflight()
    cache_dir = enable_persistent_cache()
    cache_entries = len(os.listdir(cache_dir)) if cache_dir else 0
    print(
        f"# compile cache: {'OFF' if not cache_dir else cache_dir} "
        f"({cache_entries} entries — {'warm' if cache_entries else 'cold'} start)",
        flush=True,
    )
    t_first = time.perf_counter()

    only = {s for s in os.environ.get("SWINWNET_BENCH_CONFIGS", "").split(",") if s}

    def want(name):
        return not only or name in only

    rng = np.random.default_rng(0)
    records = []

    def wnet(dtype, use_pallas, remat=False):
        return SwinWNet(
            in_chans=1, error_matrix=True, embed_dim=48, depths=(2, 2, 2, 2),
            num_heads=(3, 6, 12, 24), window_size=5, attn_chunk=8192,
            use_pallas=use_pallas, remat=remat, dtype=dtype,
        )

    # ---------------- serving configs ----------------
    serving = [
        ("full_b64_bf16", 64, jnp.bfloat16, True),
        ("full_b1_bf16", 1, jnp.bfloat16, True),
        ("full_b8_fp32", 8, jnp.float32, False),
    ]
    for name, batch, dtype, use_pallas in serving:
        if not want(name):
            continue
        model = wnet(dtype, use_pallas)
        x = jnp.asarray(rng.uniform(0, 1e3, (batch, 2, 250, 480)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])

        @jax.jit
        def step(variables, x, model=model):
            out = inference_stages(model, variables, x)["images_masked_hr"]
            return x + 1e-12 * out[:, :, :250, :480].sum().astype(jnp.float32)

        flops_per_img = _cost_per_image(step, batch, variables, x)
        ips, iters, dt = _bench_serving(step, variables, x, batch, TARGET_S)
        rec = {
            "name": name, "kind": "serving_full_pipeline", "batch": batch,
            "dtype": "float32" if dtype == jnp.float32 else "bfloat16",
            "use_pallas": use_pallas, "images_per_sec": round(ips, 2),
            "iters": iters, "steady_state_s": round(dt, 1),
        }
        if batch == 1:
            rec["latency_ms_per_image"] = round(1e3 / ips, 1)
        if flops_per_img:
            rec["gflops_per_image"] = round(flops_per_img / 1e9, 1)
            # v5e bf16 peak ~197 TFLOP/s; fp32 (HIGHEST) ~1/4 of that
            peak = 197e12 if dtype != jnp.float32 else 49e12
            rec["mfu_pct"] = round(100.0 * flops_per_img * ips / peak, 2)
        records.append(rec)
        print(f"# {name}: {ips:.2f} img/s ({iters} iters, {dt:.0f}s)", flush=True)

    # ---------------- segmentation-only (config #1) ----------------
    if want("seg_only_b64_bf16"):
        from swinwnet_tpu.pipelines.simple import make_segmentation_fn

        seg_model = SwinUNet(
            in_chans=2, embed_dim=48, depths=(2, 2, 2, 2),
            num_heads=(3, 6, 12, 24), window_size=5, attn_chunk=8192,
            use_pallas=True, dtype=jnp.bfloat16,
        )
        batch = 64
        x = jnp.asarray(rng.uniform(0, 1e3, (batch, 2, 250, 480)), jnp.float32)
        variables = seg_model.init(jax.random.PRNGKey(0), x[:1])
        seg_fn = make_segmentation_fn(seg_model)

        @jax.jit
        def seg_step(variables, x):
            prob = seg_fn(variables, x)
            return x + 1e-12 * prob.sum().astype(jnp.float32)

        ips, iters, dt = _bench_serving(seg_step, variables, x, batch, TARGET_S)
        records.append({
            "name": "seg_only_b64_bf16", "kind": "serving_config1_segmentation",
            "batch": batch, "dtype": "bfloat16", "use_pallas": True,
            "images_per_sec": round(ips, 2), "iters": iters,
            "steady_state_s": round(dt, 1),
        })
        print(f"# seg_only_b64_bf16: {ips:.2f} img/s ({iters} iters, {dt:.0f}s)", flush=True)

    # ---------------- RL alpha-policy pipeline (config #5) ----------------
    if want("rl_full_b64_bf16"):
        from swinwnet_tpu.models.alpha_policy import AlphaPolicy
        from swinwnet_tpu.pipelines.rl_inference import rl_inference_stages

        model = wnet(jnp.bfloat16, True)
        policy = AlphaPolicy()
        batch = 64
        x = jnp.asarray(rng.uniform(0, 1e3, (batch, 2, 250, 480)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        pv = policy.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 125, 240)))

        @jax.jit
        def rl_step(variables, pv, x):
            out = rl_inference_stages(model, policy, variables, pv, x)["images_masked_hr"]
            return x + 1e-12 * out[:, :, :250, :480].sum().astype(jnp.float32)

        step = lambda v, xx: rl_step(v, pv, xx)
        ips, iters, dt = _bench_serving(step, variables, x, batch, TARGET_S)
        records.append({
            "name": "rl_full_b64_bf16", "kind": "serving_config5_rl_pipeline",
            "batch": batch, "dtype": "bfloat16", "use_pallas": True,
            "images_per_sec": round(ips, 2), "iters": iters,
            "steady_state_s": round(dt, 1),
        })
        print(f"# rl_full_b64_bf16: {ips:.2f} img/s ({iters} iters, {dt:.0f}s)", flush=True)

    # ---------------- training steps (quality-run config) ----------------
    if want("train_stage1_b4") or want("train_stage3_odd_b4"):
        from swinwnet_tpu.train.freeze import masked_adamw
        from swinwnet_tpu.train.losses import combined_loss, smooth_l1_loss
        from swinwnet_tpu.train.trainers import (
            TrainState, make_stage1_step, make_stage3_steps,
        )

        batch = 4
        model = wnet(jnp.float32, False, remat=True)
        images = jnp.asarray(rng.uniform(0, 1e3, (batch, 1, 250, 480)), jnp.float32)
        masks = jnp.asarray((rng.uniform(size=(batch, 250, 480)) > 0.9), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 250, 480)))["params"]

        model_bf16 = wnet(jnp.bfloat16, False, remat=True)  # bf16 compute, fp32 params
        train_cfgs = []
        if want("train_stage1_b4"):
            tx1 = masked_adamw(params, "stage1", 1e-4)
            step1 = make_stage1_step(model, tx1, combined_loss)
            train_cfgs.append(("train_stage1_b4", "training_stage1_step", "float32", step1, tx1))
        if want("train_stage1_b4_bf16"):
            tx1b = masked_adamw(params, "stage1", 1e-4)
            step1b = make_stage1_step(model_bf16, tx1b, combined_loss)
            train_cfgs.append(("train_stage1_b4_bf16", "training_stage1_step", "bfloat16", step1b, tx1b))
        if want("train_stage3_odd_b4"):
            tx3 = masked_adamw(params, "stage3", 1e-4)
            _, odd_step, _, _ = make_stage3_steps(model, tx3, combined_loss, smooth_l1_loss)
            train_cfgs.append(("train_stage3_odd_b4", "training_stage3_odd_step", "float32", odd_step, tx3))
        if want("train_stage3_odd_b4_bf16"):
            tx3b = masked_adamw(params, "stage3", 1e-4)
            _, odd_step_b, _, _ = make_stage3_steps(model_bf16, tx3b, combined_loss, smooth_l1_loss)
            train_cfgs.append(("train_stage3_odd_b4_bf16", "training_stage3_odd_step", "bfloat16", odd_step_b, tx3b))

        for name, kind, dt_name, step, tx in train_cfgs:
            state = TrainState.create(params, tx)
            ips, iters, dt = _bench_training(step, state, images, masks, batch, TARGET_S)
            records.append({
                "name": name, "kind": kind, "batch": batch, "dtype": dt_name,
                "remat": True, "images_per_sec": round(ips, 2), "iters": iters,
                "steady_state_s": round(dt, 1),
            })
            print(f"# {name}: {ips:.2f} img/s ({iters} iters, {dt:.0f}s)", flush=True)

    # ---------------- loader-fed training (input-pipeline overlap) ----------------
    if want("train_stage1_b4_loader_py") or want("train_stage1_b4_loader_native"):
        from swinwnet_tpu.data import ArrayLoader
        from swinwnet_tpu.data.native_loader import NativeBatcher
        from swinwnet_tpu.data.noise import make_train_noise_augment
        from swinwnet_tpu.train.freeze import masked_adamw
        from swinwnet_tpu.train.losses import combined_loss
        from swinwnet_tpu.train.trainers import TrainState, make_stage1_step

        batch = 4
        model = wnet(jnp.float32, False, remat=True)
        n_src = 64  # divisible by batch: every step sees a full static shape
        images_np = rng.uniform(0, 1e3, (n_src, 250, 480)).astype(np.float32)
        masks_np = (rng.uniform(size=(n_src, 250, 480)) > 0.9).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 250, 480)))["params"]
        tx = masked_adamw(params, "stage1", 1e-4)
        step = make_stage1_step(model, tx, combined_loss)

        def py_stream():
            loader = ArrayLoader(
                images_np, masks_np, batch_size=batch, shuffle=True,
                augment=make_train_noise_augment(),
            )
            while True:
                yield from loader

        def native_stream():
            nb = NativeBatcher(images_np, masks_np, batch_size=batch, shuffle=True,
                               add_noise=True)
            while True:
                imgs, msks, _ = nb.next()
                yield imgs, msks

        streams = []
        if want("train_stage1_b4_loader_py"):
            streams.append(("train_stage1_b4_loader_py", py_stream))
        if want("train_stage1_b4_loader_native") and NativeBatcher.available():
            streams.append(("train_stage1_b4_loader_native", native_stream))
        for name, mk_stream in streams:
            it = mk_stream()
            state = TrainState.create(params, tx)
            imgs0, msks0 = next(it)
            s, _aux = step(state, jnp.asarray(imgs0), jnp.asarray(msks0))
            _ = float(np.asarray(s.step))  # warmup + compile barrier

            def run(n, it=it, state=state):
                ss = state
                for _ in range(n):
                    imgs, msks = next(it)
                    ss, _ = step(ss, jnp.asarray(imgs), jnp.asarray(msks))
                _ = float(np.asarray(ss.step))

            iters, _ = _steady_iters(run, TARGET_S)
            t0 = time.perf_counter()
            run(iters)
            dt = time.perf_counter() - t0
            ips = batch * iters / dt
            records.append({
                "name": name, "kind": "training_stage1_loader_fed", "batch": batch,
                "dtype": "float32", "remat": True, "images_per_sec": round(ips, 2),
                "iters": iters, "steady_state_s": round(dt, 1),
            })
            print(f"# {name}: {ips:.2f} img/s ({iters} iters, {dt:.0f}s)", flush=True)

    # ---------------- data-mesh serving (per-chip scaling harness) ----------------
    mesh_mode = os.environ.get("SWINWNET_BENCH_MESH", "") not in ("", "0") or (
        "--mesh" in __import__("sys").argv
    )
    if mesh_mode and want("full_b64_bf16_mesh"):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = np.asarray(jax.devices())
        n_dev = len(devices)
        mesh = Mesh(devices, ("data",))
        model = wnet(jnp.bfloat16, True)
        batch = 64 * n_dev  # keep per-chip batch at the headline's 64
        x_host = rng.uniform(0, 1e3, (batch, 2, 250, 480)).astype(np.float32)
        x = jax.device_put(x_host, NamedSharding(mesh, P("data")))
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 250, 480))),
            NamedSharding(mesh, P()),
        )

        @jax.jit
        def mesh_step(variables, x):
            out = inference_stages(model, variables, x)["images_masked_hr"]
            return x + 1e-12 * out[:, :, :250, :480].sum().astype(jnp.float32)

        ips, iters, dt = _bench_serving(mesh_step, variables, x, batch, TARGET_S)
        records.append({
            "name": "full_b64_bf16_mesh", "kind": "serving_full_pipeline_mesh",
            "batch": batch, "devices": n_dev, "dtype": "bfloat16",
            "use_pallas": True, "images_per_sec": round(ips, 2),
            "images_per_sec_per_chip": round(ips / n_dev, 2),
            "iters": iters, "steady_state_s": round(dt, 1),
        })
        print(
            f"# full_b64_bf16_mesh: {ips:.2f} img/s over {n_dev} device(s) "
            f"({ips / n_dev:.2f} img/s/chip, {iters} iters, {dt:.0f}s)",
            flush=True,
        )

    # ---------------- headline line ----------------
    if not records:
        raise SystemExit(
            f"no benchmark records were produced — SWINWNET_BENCH_CONFIGS={sorted(only)!r} "
            "matched no known config name"
        )
    head = next((r for r in records if r["name"] == "full_b64_bf16"), None)
    rec = {
        "metric": "swinwnet_full_inference_throughput",
        "unit": "images/sec/chip",
        "target_steady_state_s": TARGET_S,
        "compile_cache": {
            "dir": cache_dir,
            "entries_at_start": cache_entries,
            "wall_s_total": round(time.perf_counter() - t_first, 1),
        },
        "records": records,
    }
    if head is not None:
        rec.update(
            value=head["images_per_sec"],
            vs_baseline=round(head["images_per_sec"] / BASELINE_IPS, 3),
            batch=head["batch"],
            dtype=head["dtype"],
            use_pallas=head.get("use_pallas", False),
        )
        if "mfu_pct" in head:
            rec["gflops_per_image"] = head["gflops_per_image"]
            rec["mfu_pct"] = head["mfu_pct"]
    else:
        # the headline config was filtered out: report the first record's
        # number but LABEL it, and omit vs_baseline (it anchors full_b64_bf16
        # only — ADVICE r03)
        rec.update(
            value=records[0]["images_per_sec"],
            headline_config=records[0]["name"],
            batch=records[0]["batch"],
            dtype=records[0]["dtype"],
        )
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
