"""Multi-metric benchmark portfolio on one TPU chip (BASELINE.json surface).

Covers, beyond bench.py's headline ResNet-50 line:
  * fcos_800_imgs_per_sec      — COCO-shaped FCOS train step (800x800)
  * vit_b16_imgs_per_sec       — ViT-B/16 train step (224, no BatchNorm)
  * sam_b_1024_step_ms         — SAM-B full train step at 1024x1024
  * batched_nms_p50_ms         — fixed-shape batched NMS, 1000 boxes x 80
                                 classes, device time (slope-timed: one relay
                                 call costs ~26-32ms, see ROADMAP round-2)
  * input_pipeline_stall_pct   — steady-state host-stall of the threaded
                                 loader + AutoAugment vs a device-resident
                                 batch (north-star: "zero host-aug stalls")

Timing protocol (perf/slope.py findings): warmup with a host fetch of a
scalar, then N async back-to-back step calls ending in ONE host fetch.
jax.block_until_ready is NOT a reliable barrier through the axon relay.

Each metric reports measured model flops (XLA cost analysis on the compiled
step) so MFU is exact, not hand-derived.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def chip_peak_flops():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v4" in kind:
        return 275e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    return 197e12


def device_kind():
    return getattr(jax.devices()[0], "device_kind", "unknown")


def _build_step(model, criterion, make_loss_fn, batch, init_args,
                skip_nonfinite=False):
    from simpleaicv_tpu.core.engine import (EngineConfig, create_train_state,
                                            make_train_step)
    from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
    from simpleaicv_tpu.core.schedule import SchedulerConfig

    rng = jax.random.PRNGKey(0)
    # jitted init: eager init dispatches op-by-op through the ~26-32ms/call
    # relay and reads as a compile hang (ROADMAP round-2)
    variables = jax.jit(lambda r: model.init({"params": r}, *init_args))(rng)
    params = variables["params"]
    state_vars = {k: v for k, v in variables.items() if k != "params"}
    opt_cfg = OptimizerConfig(name="SGD", lr=0.01, momentum=0.9,
                              weight_decay=1e-4)
    sched_cfg = SchedulerConfig(scheduler="CosineLR", lr=0.01, epochs=100)
    tx, _ = build_optimizer(opt_cfg, sched_cfg, 1000, params)
    eng_cfg = EngineConfig(skip_non_finite=skip_nonfinite)
    state = create_train_state(params, state_vars, tx, eng_cfg)
    step = make_train_step(make_loss_fn(model, criterion), tx, eng_cfg)
    return state, step, rng


def _run_timed(step, state, batch, rng, steps):
    """Returns (imgs_or_steps_per_sec measured over `steps`, flops/step)."""
    state, m = step(state, batch, rng)
    float(m["loss"])                       # compile + hard barrier
    flops = None
    try:
        lowered = jax.jit(step).lower(state, batch, rng)
        flops = lowered.compile().cost_analysis().get("flops")
    except Exception:
        pass
    # pre-materialise per-step rngs: an EAGER fold_in inside the timed loop
    # dispatches through the ~26-32ms relay and serializes the async queue
    # (measured 1751ms/step vs 219ms real on SAM-B, perf/sam_engine_bisect)
    rngs = [jax.random.fold_in(rng, i) for i in range(steps)]
    jax.block_until_ready(rngs)
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, batch, rngs[i])
    float(m["loss"])
    dt = time.perf_counter() - t0
    return dt / steps, flops


def bench_resnet50(steps=100, batch=128, image=224):
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.losses import CELoss
    from simpleaicv_tpu.tasks.classification import make_loss_fn

    model = BACKBONES.create("resnet50", num_classes=1000)
    x0 = jnp.zeros((batch, image, image, 3), jnp.bfloat16)
    data = {
        "image": jnp.asarray(np.random.RandomState(0).randn(
            batch, image, image, 3), jnp.bfloat16),
        "label": jnp.asarray(np.random.RandomState(1).randint(
            0, 1000, (batch,)), jnp.int32),
    }
    state, step, rng = _build_step(model, CELoss(), make_loss_fn, data,
                                   (x0, True))
    sec_per_step, flops = _run_timed(step, state, data, rng, steps)
    imgs = batch / sec_per_step
    out = {"value": round(imgs, 2), "unit": "images/s"}
    if flops:
        out["mfu"] = round(flops / sec_per_step / chip_peak_flops(), 4)
    return out


def bench_vit_b16(steps=50, batch=128, image=224,
                  network="vit_base_patch16", **model_kw):
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.losses import CELoss
    from simpleaicv_tpu.tasks.classification import make_loss_fn

    model = BACKBONES.create(network, image_size=image,
                             num_classes=1000, **model_kw)
    x0 = jnp.zeros((batch, image, image, 3), jnp.bfloat16)
    data = {
        "image": jnp.asarray(np.random.RandomState(0).randn(
            batch, image, image, 3), jnp.bfloat16),
        "label": jnp.asarray(np.random.RandomState(1).randint(
            0, 1000, (batch,)), jnp.int32),
    }
    state, step, rng = _build_step(model, CELoss(), make_loss_fn, data,
                                   (x0, True))
    sec_per_step, flops = _run_timed(step, state, data, rng, steps)
    imgs = batch / sec_per_step
    out = {"value": round(imgs, 2), "unit": "images/s"}
    if flops:
        out["mfu"] = round(flops / sec_per_step / chip_peak_flops(), 4)
    return out


def bench_fcos_800(steps=30, batch=8, image=800):
    from simpleaicv_tpu.core.registry import MODELS, LOSSES
    from simpleaicv_tpu.tasks.detection import make_loss_fn

    model = MODELS.create("resnet50_fcos", num_classes=80)
    rng_np = np.random.RandomState(0)
    ann = -np.ones((batch, 32, 5), np.float32)
    for i in range(batch):
        for j in range(rng_np.randint(1, 20)):
            x1, y1 = rng_np.rand(2) * 600
            w, h = rng_np.rand(2) * 180 + 16
            ann[i, j] = [x1, y1, x1 + w, y1 + h, rng_np.randint(80)]
    data = {
        "image": jnp.asarray(rng_np.randn(batch, image, image, 3),
                             jnp.bfloat16),
        "annots": jnp.asarray(ann),
    }
    x0 = jnp.zeros((2, image, image, 3), jnp.bfloat16)
    state, step, rng = _build_step(model, LOSSES.create("FCOSLoss"),
                                   make_loss_fn, data, (x0, True))
    sec_per_step, flops = _run_timed(step, state, data, rng, steps)
    out = {"value": round(batch / sec_per_step, 2), "unit": "images/s"}
    if flops:
        out["mfu"] = round(flops / sec_per_step / chip_peak_flops(), 4)
    return out


_SAM_FWD_FLOPS = {}


def _sam_fwd_flops(variant, image):
    """XLA-counted forward flops for one image through the NON-flash SAM.

    Used as the MFU basis for every SAM leg (train flops ~= 3x fwd, the
    same convention as bench.py's ResNet metric). The flash legs cannot use
    their own cost analysis: both the online-softmax forward and the
    round-5 blockwise backward run under ``lax.scan``, and XLA's
    ``cost_analysis()`` counts a loop body ONCE regardless of trip count,
    so the scan graphs under-report flops (~40% low at b4, worse at b8).
    The einsum graph at b1 counts fully; flops scale linearly in batch.
    """
    key = (variant, image)
    if key not in _SAM_FWD_FLOPS:
        from simpleaicv_tpu.models.interactive_segmentation.sam import (
            sam_b, sam_h)
        build = sam_h if variant == "h" else sam_b
        model = build(image_size=image, use_flash_attention=False)
        rng_np = np.random.RandomState(0)
        img = jnp.asarray(rng_np.randn(1, image, image, 3), jnp.bfloat16)
        pts = jnp.asarray(
            np.concatenate([rng_np.rand(1, 1, 2) * image,
                            np.ones((1, 1, 1))], -1).astype(np.float32))
        prompts = {"prompt_point": pts, "prompt_box": None,
                   "prompt_mask": None}
        variables = jax.jit(
            lambda r: model.init({"params": r}, img, prompts)
        )(jax.random.PRNGKey(0))
        fwd = jax.jit(lambda v, im: model.apply(v, im, prompts,
                                                mutable=False))
        _SAM_FWD_FLOPS[key] = float(
            fwd.lower(variables, img).compile().cost_analysis()["flops"])
    return _SAM_FWD_FLOPS[key]


def bench_sam_b_1024(steps=10, batch=1, image=1024, use_flash=False,
                     variant="b", remat=False):
    from simpleaicv_tpu.core.registry import LOSSES
    from simpleaicv_tpu.models.interactive_segmentation.sam import (sam_b,
                                                                    sam_h)
    from simpleaicv_tpu.tasks.interactive_segmentation import make_loss_fn

    build = sam_h if variant == "h" else sam_b
    model = build(image_size=image, use_flash_attention=use_flash,
                  use_gradient_checkpoint=remat)
    rng_np = np.random.RandomState(0)
    pts = np.zeros((batch, 1, 3), np.float32)
    pts[:, :, :2] = rng_np.rand(batch, 1, 2) * image
    pts[:, :, 2] = 1.0
    data = {
        "image": jnp.asarray(rng_np.randn(batch, image, image, 3),
                             jnp.bfloat16),
        "prompt_point": jnp.asarray(pts),
        "prompt_box": None,
        "prompt_mask": None,
        "mask": jnp.asarray(rng_np.rand(batch, image, image) > 0.5,
                            jnp.float32),
    }
    init_prompts = {"prompt_point": data["prompt_point"],
                    "prompt_box": None, "prompt_mask": None}
    state, step, rng = _build_step(
        model, LOSSES.create("SAMMultiLevelLoss"), make_loss_fn, data,
        (data["image"][:1], init_prompts))
    sec_per_step, _ = _run_timed(step, state, data, rng, steps)
    out = {"value": round(sec_per_step * 1000, 2), "unit": "ms/step",
           "batch": batch}
    try:  # analytic 3x-fwd basis; see _sam_fwd_flops for why not the
        flops = 3.0 * batch * _sam_fwd_flops(variant, image)  # leg's own
        out["mfu"] = round(flops / sec_per_step / chip_peak_flops(), 4)
        out["mfu_basis"] = "3x XLA fwd flops (einsum graph, scaled by batch)"
    except Exception as e:
        out["mfu_error"] = f"{type(e).__name__}: {e}"[:120]
    return out


def bench_nms_p50(reps=(8, 32)):
    """Device time per batched-NMS call (1000 boxes, 80 classes) via slope
    timing: time rep-chained calls at two counts; the ~26-32ms relay latency
    cancels in the difference."""
    rng_np = np.random.RandomState(0)
    n = 1000
    ctr = rng_np.rand(n, 2) * 800
    wh = rng_np.rand(n, 2) * 120 + 8
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng_np.rand(n).astype(np.float32)
    classes = rng_np.randint(0, 80, n).astype(np.float32)

    from simpleaicv_tpu.ops.nms import nms_keep_mask
    from functools import partial

    @partial(jax.jit, static_argnums=3)
    def chain(boxes, scores, classes, k):
        # class-offset trick: per-class NMS in one fixed-shape pass
        off = boxes + classes[:, None] * 4096.0

        def body(i, s):
            mask = nms_keep_mask(off, s, iou_threshold=0.5)
            # data dependency so the loop can't be collapsed
            return jnp.where(mask, s, s * 0.999999)

        return jnp.sum(jax.lax.fori_loop(0, k, body, scores))

    times = {}
    for k in reps:
        out = chain(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(classes), k)
        float(out)  # compile+sync
        t0 = time.perf_counter()
        for _ in range(5):
            out = chain(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(classes), k)
        float(out)
        times[k] = (time.perf_counter() - t0) / 5
    k0, k1 = reps
    per_call = (times[k1] - times[k0]) / (k1 - k0)
    return {"value": round(per_call * 1000, 3), "unit": "ms",
            "boxes": n, "classes": 80}


def bench_input_pipeline(steps=30, batch=128, image=224):
    """Steady-state input-pipeline stall for three pipelines:

      * host-aug   — reference-style: PIL AutoAugment inside DataLoader
                     workers (GIL/core-bound; the reference assumes 16+
                     host cores per accelerator)
      * device-aug — TPU-first: workers emit raw [0,255] batches; the full
                     AutoAugment + normalize + erasing + mixup stack runs
                     inside the jitted step (data/device_augment.py)
      * compute-only baseline on a device-resident batch

    Host cores are reported: stall pct is a property of (pipeline, host),
    and this bench box has very few cores — exactly the environment the
    device-aug path is designed for."""
    from simpleaicv_tpu.core.registry import BACKBONES
    from simpleaicv_tpu.losses import CELoss
    from simpleaicv_tpu.tasks.classification import make_loss_fn
    from simpleaicv_tpu.data.datasets import FakeClassificationDataset
    from simpleaicv_tpu.data.collater import ClassificationCollater
    from simpleaicv_tpu.data.auto_rand_augment import AutoAugment
    from simpleaicv_tpu.data.device_augment import (DeviceAugmentPipeline,
                                                    DeviceAutoAugment,
                                                    DeviceRandomErasing)
    from simpleaicv_tpu.data.loader import DataLoader

    model = BACKBONES.create("resnet50", num_classes=1000)
    x0 = jnp.zeros((batch, image, image, 3), jnp.bfloat16)
    const_batch = {
        "image": jnp.asarray(np.random.RandomState(0).randn(
            batch, image, image, 3), jnp.bfloat16),
        "label": jnp.asarray(np.random.RandomState(1).randint(
            0, 1000, (batch,)), jnp.int32),
    }
    state, step, rng = _build_step(model, CELoss(), make_loss_fn, const_batch,
                                   (x0, True))
    state, m = step(state, const_batch, rng)
    float(m["loss"])

    # device-aug step: same model step with the augment_fn hook compiled in
    from simpleaicv_tpu.core.engine import (EngineConfig, make_train_step)
    from simpleaicv_tpu.core.optim import OptimizerConfig, build_optimizer
    from simpleaicv_tpu.core.schedule import SchedulerConfig
    pipe = DeviceAugmentPipeline(augment=DeviceAutoAugment("original"),
                                 erasing=DeviceRandomErasing(prob=0.25))
    opt_cfg = OptimizerConfig(name="SGD", lr=0.01, momentum=0.9,
                              weight_decay=1e-4)
    sched_cfg = SchedulerConfig(scheduler="CosineLR", lr=0.01, epochs=100)
    tx, _ = build_optimizer(opt_cfg, sched_cfg, 1000, state.params)
    step_aug = make_train_step(make_loss_fn(model, CELoss()), tx,
                               EngineConfig(), augment_fn=pipe, donate=False)
    # uint8 like the production device-aug transport (the pipeline casts
    # to f32 on chip); must match the loader feed dtype or the step would
    # recompile mid-timing
    raw_batch = {
        "image": jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (batch, image, image, 3), dtype=np.uint8)),
        "label": const_batch["label"],
    }
    state, m = step_aug(state, raw_batch, rng)
    float(m["loss"])

    # compute-only reference (rngs pre-materialised — see _run_timed)
    rngs = [jax.random.fold_in(rng, i) for i in range(steps)]
    jax.block_until_ready(rngs)

    def timed(fn, batch_iter, n):
        # fresh buffer copies: the compute-only step donates its state arg,
        # so each timed run must start from un-donated buffers
        st = jax.tree.map(lambda x: x.copy(), state)
        mm = m
        t0 = time.perf_counter()
        done = 0
        for b in batch_iter:
            st, mm = fn(st, b, rngs[done])
            done += 1
            if done >= n:
                break
        float(mm["loss"])
        return (time.perf_counter() - t0) / max(done, 1)

    t_compute = timed(step, iter(lambda: const_batch, None), steps)
    t_devaug = timed(step_aug, iter(lambda: raw_batch, None), steps)

    import os
    out = {"compute_ms": round(t_compute * 1000, 2),
           "deviceaug_resident_ms": round(t_devaug * 1000, 2),
           "deviceaug_overhead_ms": round((t_devaug - t_compute) * 1000, 2),
           "host_cores": os.cpu_count()}

    def loader_feed(transform, n, use_aug_step):
        ds = FakeClassificationDataset(num_samples=batch * (n + 4),
                                       image_hw=image, num_classes=1000,
                                       transform=transform)
        # device-aug leg ships uint8 (1/4 the pipe + PCIe bytes)
        coll = ClassificationCollater(
            image_dtype="uint8" if use_aug_step else np.float32)
        loader = DataLoader(ds, batch, coll,
                            num_workers=8, shuffle=False, drop_last=True,
                            worker_mode="process")
        it = iter(loader)
        b0 = next(it)  # warm the worker pool

        def feed():
            for b in it:
                if use_aug_step:
                    yield {"image": jnp.asarray(b["image"]),
                           "label": jnp.asarray(b["label"]).astype(jnp.int32)}
                else:
                    yield {"image": jnp.asarray(b["image"]).astype(
                               jnp.bfloat16),
                           "label": jnp.asarray(b["label"]).astype(jnp.int32)}
        return feed()

    # reference-style: host PIL AutoAugment in workers (few steps: slow)
    n_host = min(steps, 8)
    t_host = timed(step, loader_feed(AutoAugment(policy="original"),
                                     n_host, False), n_host)
    out["hostaug_with_loader_ms"] = round(t_host * 1000, 2)
    out["hostaug_stall_pct"] = round(
        max(0.0, (t_host - t_compute) / t_compute) * 100, 2)

    # TPU-first: raw loader + in-step device augmentation
    t_dev = timed(step_aug, loader_feed(None, steps, True), steps)
    out["deviceaug_with_loader_ms"] = round(t_dev * 1000, 2)
    out["deviceaug_stall_pct"] = round(
        max(0.0, (t_dev - t_devaug) / t_devaug) * 100, 2)

    # decode-once packed cache (data/packed.py): steady-state epochs read
    # uint8 records through one C-memcpy gather per batch — no decode, no
    # per-sample python, no pickle — feeding the same device-aug step
    import tempfile
    from simpleaicv_tpu.data.packed import (PackReader, PackWriter,
                                            PackedLoader)
    n_pack = batch * 12
    pack_path = os.path.join(tempfile.gettempdir(), "bench_cache.pack")
    rng_np = np.random.RandomState(0)
    with PackWriter(pack_path, {"image": ((image, image, 3), "uint8"),
                                "label": ((), "int32")}, n_pack) as w:
        img_chunk = rng_np.randint(0, 256, (batch, image, image, 3),
                                   np.uint8)
        for i in range(n_pack):
            w.add({"image": img_chunk[i % batch],
                   "label": np.int32(i % 1000)})

    def cached_feed(n):
        loader = PackedLoader(pack_path, batch, shuffle=True, seed=0)
        done = 0
        epoch = 0
        while done < n:
            loader.set_epoch(epoch)
            for b in loader:
                yield {"image": jnp.asarray(b["image"]),
                       "label": jnp.asarray(b["label"])}
                done += 1
                if done >= n:
                    return
            epoch += 1

    feed = cached_feed(steps + 1)
    next(feed)  # warm the prefetch thread + page cache
    t_cached = timed(step_aug, feed, steps)
    out["cached_with_loader_ms"] = round(t_cached * 1000, 2)
    out["cached_stall_pct"] = round(
        max(0.0, (t_cached - t_devaug) / t_devaug) * 100, 2)

    # transport OVERLAP (core/trainer.py _device_prefetch does this in
    # production): issue batch N+1's device_put while step N executes —
    # dispatch is async, so if the relay can progress a put during compute
    # the measured stall shrinks by the overlap factor. The plain cached
    # leg above puts synchronously with consumption.
    def cached_feed_overlapped(n):
        it = cached_feed(n + 1)
        buf = None
        for b in it:
            nxt = {k: jax.device_put(v) for k, v in b.items()}
            if buf is not None:
                yield buf
            buf = nxt
        if buf is not None:
            yield buf

    feed = cached_feed_overlapped(steps + 1)
    next(feed)
    t_overlap = timed(step_aug, feed, steps)
    out["cached_prefetch_with_loader_ms"] = round(t_overlap * 1000, 2)
    out["cached_prefetch_stall_pct"] = round(
        max(0.0, (t_overlap - t_devaug) / t_devaug) * 100, 2)
    stall_serial = max(t_cached - t_devaug, 1e-9)
    stall_overlap = max(t_overlap - t_devaug, 1e-9)
    out["h2d_overlap_factor"] = round(stall_serial / stall_overlap, 2)

    # host-core budget: imgs/s/core for the two host-side input strategies,
    # -> cores needed to feed the measured ResNet-50 headline rate
    reader = PackReader(pack_path)
    idx = np.random.RandomState(1).randint(0, n_pack, (8, batch))
    reader.read_batch(idx[0], n_threads=1)  # fault pages in
    t0 = time.perf_counter()
    for k in range(8):
        reader.read_batch(idx[k], n_threads=1)
    cached_rate = 8 * batch / (time.perf_counter() - t0)
    out["cached_read_imgs_per_sec_core"] = round(cached_rate, 1)

    jpeg_rate = None
    try:
        import cv2
        from simpleaicv_tpu.data import native_io
        if native_io.available():
            # photo-like synthetic (smooth gradient + texture): noise-only
            # JPEGs decode unrealistically slowly
            yy, xx = np.mgrid[0:500, 0:375]
            base = (96 + 64 * np.sin(yy / 37.0) + 48 * np.cos(xx / 23.0))
            img = np.clip(base[..., None] + np.random.RandomState(0)
                          .randn(500, 375, 3) * 12, 0, 255).astype(np.uint8)
            okflag, enc = cv2.imencode(".jpg", img,
                                       [cv2.IMWRITE_JPEG_QUALITY, 90])
            data = enc.tobytes()
            native_io.decode_resize(data, image, letterbox=False)
            t0 = time.perf_counter()
            reps = 64
            for _ in range(reps):
                native_io.decode_resize(data, image, letterbox=False)
            jpeg_rate = reps / (time.perf_counter() - t0)
            out["jpeg_decode_imgs_per_sec_core"] = round(jpeg_rate, 1)
    except Exception:
        pass

    target = batch / t_compute          # the compute-bound consumption rate
    out["host_core_budget"] = {
        "target_imgs_per_sec": round(target, 1),
        "cores_needed_cached": round(target / cached_rate, 2),
        "cores_needed_jpeg":
            round(target / jpeg_rate, 2) if jpeg_rate else None,
    }

    # host->device TRANSFER attribution: on the axon relay the uint8 batch
    # upload (batch*image^2*3 bytes over loopback HTTP) — not host decode —
    # is the residual stall of the cached path. Measure put bandwidth on
    # the same-size buffer.
    buf = np.random.RandomState(3).randint(0, 256,
                                           (batch, image, image, 3),
                                           np.uint8)
    jax.device_put(buf).block_until_ready()          # warm
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        d = jax.device_put(buf)
    float(jnp.sum(d[0, 0, 0]))                       # hard barrier
    t_put = (time.perf_counter() - t0) / reps
    out["h2d_put_serialized_ms"] = round(t_put * 1000, 2)
    out["h2d_put_serialized_mb_s"] = round(buf.nbytes / t_put / 1e6, 1)
    # effective ingest the PIPELINED loop achieved (loader thread overlaps
    # the next batch's transfer with compute): bytes per batch over the
    # non-compute gap. This is the honest transport number; the serialized
    # put above shows the relay's worst case.
    gap_s = max(1e-6, (out["cached_with_loader_ms"]
                       - out["deviceaug_resident_ms"]) / 1000)
    out["effective_ingest_mb_s"] = round(buf.nbytes / gap_s / 1e6, 1)

    out.update({"value": out["cached_stall_pct"], "unit": "%"})
    return out


def bench_detection_input_pipeline(image=1024, batch=8, n_pack=64):
    """Host-side input budget for the heavy detection vertical (COCO at
    832²–1024², SURVEY §7 hard part 7): packed-record gather + batch-dict
    collate rate per core vs native JPEG decode at detection resolution,
    against the measured FCOS consumption rate. The pack trades the 5-core
    JPEG budget for a memcpy (tools/prepare_dataset.py pack-coco)."""
    import os
    import tempfile

    from simpleaicv_tpu.data import native_io
    from simpleaicv_tpu.data.packed import PackReader
    from simpleaicv_tpu.data.packed_tasks import (PackedDetectionCollate,
                                                  pack_detection_dataset)

    class _Synth:
        """Photo-like synthetic detection samples (decode-realistic)."""

        class_names = ["a", "b"]

        def __len__(self):
            return n_pack

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            yy, xx = np.mgrid[0:500, 0:666]
            base = 96 + 64 * np.sin(yy / 37.0 + i) + 48 * np.cos(xx / 23.0)
            img = np.clip(base[..., None] + r.randn(500, 666, 3) * 12,
                          0, 255).astype(np.float32)
            ann = np.array([[50, 60, 300, 280, 0],
                            [100, 120, 400, 380, 1]], np.float32)
            return {"image": img, "annots": ann, "scale": 1.0}

    pack_path = os.path.join(tempfile.gettempdir(),
                             f"bench_det_{image}.pack")
    pack_detection_dataset(_Synth(), pack_path, image_hw=image,
                           max_annots=100)
    reader = PackReader(pack_path)
    collate = PackedDetectionCollate()
    idx = np.random.RandomState(1).randint(0, n_pack, (6, batch))
    collate(reader.read_batch(idx[0], n_threads=1))     # fault pages in
    t0 = time.perf_counter()
    for k in range(6):
        collate(reader.read_batch(idx[k], n_threads=1))
    cached_rate = 6 * batch / (time.perf_counter() - t0)

    out = {"image_hw": image,
           "cached_read_collate_imgs_per_sec_core": round(cached_rate, 1)}

    jpeg_rate = None
    if native_io.available():
        import cv2
        yy, xx = np.mgrid[0:640, 0:480]
        base = (96 + 64 * np.sin(yy / 37.0) + 48 * np.cos(xx / 23.0))
        img = np.clip(base[..., None] + np.random.RandomState(0)
                      .randn(640, 480, 3) * 12, 0, 255).astype(np.uint8)
        _, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        data = enc.tobytes()
        native_io.decode_resize(data, image, letterbox=True)
        t0 = time.perf_counter()
        reps = 24
        for _ in range(reps):
            native_io.decode_resize(data, image, letterbox=True)
        jpeg_rate = reps / (time.perf_counter() - t0)
        out["jpeg_decode_imgs_per_sec_core"] = round(jpeg_rate, 1)

    # consumption rate: the portfolio's measured FCOS-800 throughput
    # (BENCH_PORTFOLIO fcos_r50_800_train ~97 img/s on this chip)
    target = 97.4
    out["host_core_budget"] = {
        "target_imgs_per_sec": target,
        "cores_needed_cached": round(target / cached_rate, 3),
        "cores_needed_jpeg":
            round(target / jpeg_rate, 3) if jpeg_rate else None,
    }
    out.update({"value": round(target / cached_rate, 3), "unit": "cores"})
    return out


ALL = {
    "resnet50_224_train": bench_resnet50,
    "vit_b16_224_train": bench_vit_b16,
    "fcos_r50_800_train": bench_fcos_800,
    "sam_b_1024_train_step": bench_sam_b_1024,
    # VERDICT r2 #3: settle Pallas flash attention on chip vs the XLA
    # einsum path (expected loser per perf/pallas_bw_probe.py ~300GB/s cap)
    "sam_b_1024_train_step_flash":
        lambda: bench_sam_b_1024(use_flash=True),
    # VERDICT r3 #5: SAM at a real batch (MFU is meaningless at b=1) and
    # the reference flagship SAM-H (remat on: ViT-H @1024 training
    # activations exceed one chip's HBM otherwise)
    "sam_b_1024_train_step_b4_flash":
        lambda: bench_sam_b_1024(steps=6, batch=4, use_flash=True),
    "sam_b_1024_train_step_b8_flash":
        # remat on: the b8 graph crashed the remote compile helper
        # (HTTP 500) without it — activations exceed what the compiler
        # will schedule at 1024^2 x 8
        lambda: bench_sam_b_1024(steps=4, batch=8, use_flash=True,
                                 remat=True),
    "sam_h_1024_train_step_flash":
        lambda: bench_sam_b_1024(steps=4, batch=1, use_flash=True,
                                 variant="h", remat=True),
    "batched_nms_1000x80_device_time": bench_nms_p50,
    "input_pipeline_stall": bench_input_pipeline,
    # VERDICT r4 #5: the 832²–1024² verticals' host input budget through
    # the new detection pack (host-only leg, no device work)
    "detection_input_pipeline": bench_detection_input_pipeline,
    # MoE routing overhead on one chip (experts local): dense small ViT vs
    # the 8-expert top-2 MoE variant at the SAME 197-token count (patch14 @
    # 196² == patch16 @ 224²) — the delta is the one-hot dispatch/combine
    # einsum cost (parallel/moe.py)
    # VERDICT r3 #4: ViT-B MFU levers — flash attention at 197 tokens,
    # batch 256 (more rows per matmul tile)
    "vit_b16_224_train_flash":
        lambda: bench_vit_b16(use_flash_attention=True),
    "vit_b16_224_train_b256":
        lambda: bench_vit_b16(steps=25, batch=256),
    "vit_b16_224_train_b256_flash":
        lambda: bench_vit_b16(steps=25, batch=256,
                              use_flash_attention=True),
    "vit_s_197tok_train":
        lambda: bench_vit_b16(network="vit_small_patch14", image=196),
    "vit_moe_s_197tok_train":
        lambda: bench_vit_b16(network="vit_moe_small_patch16", image=224),
}


def run_portfolio(names=None):
    out = {"device_kind": device_kind()}
    for name, fn in ALL.items():
        if names and name not in names:
            continue
        try:
            t0 = time.perf_counter()
            out[name] = fn()
            out[name]["bench_seconds"] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # keep the portfolio robust
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return out


if __name__ == "__main__":
    import os
    import sys

    from simpleaicv_tpu.core.platform import apply_platform_env
    apply_platform_env()  # honour SIMPLEAICV_PLATFORM=cpu for offline smokes
    args = sys.argv[1:]
    save = "--save" in args
    merge = "--merge" in args
    names = [a for a in args if not a.startswith("--")] or None
    out = run_portfolio(names)
    print(json.dumps(out, indent=1))
    if save or merge:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_PORTFOLIO.json")
        if merge and os.path.exists(path):
            # refresh only the legs just measured; keep the rest on record
            with open(path) as f:
                prev = json.load(f)
            prev.update(out)
            out = prev
        out["measured_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"saved -> {path}")
