"""The main detection API: ``detect_video``.

Orchestration parity with reference MetDetPy.py:24-250 (loader -> detector
-> collector loop, work modes, live mode, time windows, MDRF result), with
the TPU-native execution model: when the loader is a BlockVideoLoader and
the detector supports block processing, whole ``[T, H, W]`` frame blocks are
pushed through the fused device pipeline per step instead of single frames.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from . import get_detector, get_loader, get_wrapper
from .detectors.base import BaseDetector
from .detectors.m3det import DiffAreaGuidingDetecor, LineDetector, M3Detector
from .io.videoloader import BlockVideoLoader
from .log import get_default_logger, set_default_logger
from .structs import MDRF, ClipCfg, MainDetectCfg, RuntimeParams
from .utils import (LIVE_MODE_SPEED_CTRL_CONST, VERSION, frame2time, frame2ts,
                    get_clip_config_path, get_num_class)
from .visu import OpenCVMetVisu, TextColorPair, TextVisu

def detect_video(video_name: str, mask_name: Optional[str],
                 cfg: MainDetectCfg, debug_mode: bool = False,
                 visual_mode: bool = False, work_mode: str = "frontend",
                 time_range: tuple[Optional[str], Optional[str]] = (None,
                                                                    None),
                 live_mode: bool = False,
                 provider_key: Optional[str] = None,
                 checkpoint_path: Optional[str] = None,
                 checkpoint_interval_sec: float = 60.0,
                 resume: bool = False) -> MDRF:
    """Detect meteors (and other events) in a video; returns an MDRF.

    With ``checkpoint_path`` set, detector+collector state is snapshotted
    every ``checkpoint_interval_sec``; ``resume=True`` restores from it and
    continues at the saved frame cursor (subsystem absent in the reference,
    SURVEY.md §5.4).
    """
    set_default_logger(debug_mode, work_mode)
    logger = get_default_logger()
    logger.start()

    try:
        t0 = time.time()
        LoaderCls = get_loader(cfg.loader.name)
        WrapperCls = get_wrapper(cfg.loader.wrapper)
        DetectorCls = get_detector(cfg.detector.name)
        grayscale = cfg.loader.grayscale
        start_time, end_time = time_range

        if issubclass(DetectorCls, (LineDetector, DiffAreaGuidingDetecor)):
            assert grayscale, ("Require grayscale ON when using a "
                               "LineDetector subclass.")
        else:
            assert not grayscale, ("Require grayscale OFF when using "
                                   "MLDetector.")

        global_config = ClipCfg.from_json_file(get_clip_config_path())
        recheck_on = cfg.collector.recheck_cfg.switch

        loader_kwargs = dict(
            mask_name=mask_name, resize_option=cfg.loader.resize,
            hwaccel=cfg.loader.hwaccel, start_time=start_time,
            end_time=end_time, grayscale=grayscale,
            exp_option=cfg.loader.exp_time,
            exp_upper_bound=cfg.loader.upper_bound,
            merge_func=cfg.loader.merge_func,
            continue_on_err=cfg.loader.continue_on_err)
        if issubclass(LoaderCls, BlockVideoLoader):
            loader_kwargs["keep_color_stacks"] = recheck_on
            # upload blocks from the decode thread so the h2d transfer
            # overlaps dispatch/collect (visual mode needs host frames)
            loader_kwargs["device_put"] = (
                hasattr(DetectorCls, "process_block_async")
                and not visual_mode)
        video_loader = LoaderCls(WrapperCls, video_name, **loader_kwargs)
        video_info = video_loader.summary()
        logger.info(repr(video_loader))

        start_frame = video_loader.start_frame
        end_frame = video_loader.end_frame
        rt_param = RuntimeParams(
            fps=video_loader.fps, exp_frame=video_loader.exp_frame,
            eq_fps=video_loader.eq_fps, eq_int_fps=video_loader.eq_int_fps,
            exp_time=video_loader.exp_time,
            runtime_size=video_loader.runtime_size,
            raw_size=video_loader.raw_size,
            positive_category_list=(
                global_config.export.positive_category_list))
        logger.info(f"Preprocessing finished. Time cost: "
                    f"{time.time() - t0:.1f}s.")

        if issubclass(DetectorCls, M3Detector) and (
                cfg.detector.window_sec * rt_param.eq_fps < 3):
            if video_loader.fps < 3:
                raise ValueError(
                    "M3Detector cannot work below 3 FPS; increase FPS or "
                    "use the deep-learning detector (dldet.json).")
            logger.info(f"Equivalent FPS {rt_param.eq_fps:.2f} may be too "
                        f"slow for {DetectorCls.__name__}.")

        detector: BaseDetector = DetectorCls(
            window_sec=cfg.detector.window_sec, fps=rt_param.eq_fps,
            mask=video_loader.mask, num_cls=get_num_class(),
            cfg=cfg.detector.cfg, logger=logger)

        # recheck stack source: BlockVideoLoader keeps in-memory color
        # max-stacks (no second decode); other loaders re-read via a second
        # color loader like the reference (MetDetPy.py:147-156)
        stack_provider = None
        recheck_loader = None
        if recheck_on:
            if isinstance(video_loader, BlockVideoLoader):
                e = rt_param.exp_frame

                def stack_provider(s_raw, e_raw, _vl=video_loader, _e=e,
                                   _s0=start_frame):
                    return _vl.recheck_stack((s_raw - _s0) // _e,
                                             (e_raw - _s0) // _e)
            else:
                recheck_loader = LoaderCls(
                    WrapperCls, video_name, mask_name=mask_name,
                    resize_option=cfg.loader.resize,
                    hwaccel=cfg.loader.hwaccel, grayscale=False,
                    exp_option="real-time",
                    merge_func=cfg.loader.merge_func, continue_on_err=True)

        from .track.collector import MeteorCollector
        if provider_key:
            cfg.collector.recheck_cfg.model.providers_key = provider_key
        collector = MeteorCollector(cfg.collector, rt_param,
                                    video_loader=recheck_loader,
                                    logger=logger,
                                    stack_provider=stack_provider)

        visual_manager = OpenCVMetVisu(exp_time=rt_param.exp_time,
                                       resolution=video_loader.runtime_size,
                                       flag=visual_mode)
    except Exception as e:
        logger.error(repr(e))
        logger.error("Fatal error occured when initializing.")
        logger.stop()
        raise e

    resume_idx = 0
    if resume and checkpoint_path:
        from .checkpoint import load_checkpoint
        resume_idx = load_checkpoint(checkpoint_path, detector, collector)
        video_loader.reset(
            start_frame=start_frame + resume_idx * rt_param.exp_frame)
        logger.info(f"Resumed from {checkpoint_path} at merged frame "
                    f"{resume_idx}.")

    from .profiling import StageTimer, maybe_jax_trace
    timer = StageTimer()
    t1 = time.time()
    try:
        video_loader.start()
        with maybe_jax_trace():
            if isinstance(video_loader, BlockVideoLoader):
                _run_block_loop(video_loader, detector, collector, rt_param,
                                start_frame, work_mode, live_mode,
                                visual_mode, visual_manager, logger, t0,
                                timer=timer, resume_idx=resume_idx,
                                checkpoint_path=checkpoint_path,
                                checkpoint_interval_sec=(
                                    checkpoint_interval_sec))
            else:
                _run_frame_loop(video_loader, detector, collector, rt_param,
                                start_frame, end_frame, work_mode, live_mode,
                                visual_mode, visual_manager, logger, t0)
        if not visual_manager.manual_stop:
            logger.info("VideoLoader-stop detected.")
    except Exception as e:
        logger.error(repr(e))
        raise e
    finally:
        video_loader.release()
        collector.clear()
        visual_manager.stop()
        logger.info("Time cost: %.4fs." % (time.time() - t1))
        timer.log_summary(logger)
        logger.stop()

    perf = {k: v for k, v in timer.summary().items()}
    # decode-thread stage accounting (incl. device_put upload time), so
    # consumers can decompose decode_wait into host work vs transfer
    for k, v in getattr(video_loader, "stage_stats", {}).items():
        perf[f"loader_{k}"] = round(v, 4) if isinstance(v, float) else v
    # detector-internal collect decomposition (e.g. MLDetector's grouped
    # fetch vs host postprocess split), so collect_s is attributable
    for k, v in getattr(detector, "last_collect_stats", {}).items():
        perf[f"collect_{k}"] = round(v, 4) if isinstance(v, float) else v
    return MDRF(version=VERSION, basic_info=video_info, config=cfg,
                type="prediction", anno_size=video_info.resolution,
                results=collector.met_exporter.meteor_list,
                performance=perf)


def detect_video_temporal(video_name: str, mask_name: Optional[str],
                          cfg: MainDetectCfg, n_shards: Optional[int] = None,
                          work_mode: str = "backend",
                          time_range: tuple[Optional[str],
                                            Optional[str]] = (None, None),
                          super_block_sec: Optional[float] = None
                          ) -> MDRF:
    """Batch detection with the time axis sharded over the device mesh.

    Default mode decodes + preprocesses the whole (windowed) video into
    one in-memory [T, H, W] array, then runs the COMPLETE fused detect
    step time-sharded (parallel.temporal.detect_frames_temporal): on an
    N-chip slice an N-times-longer clip finishes in the same device wall
    time.

    With ``super_block_sec`` set, the clip is processed in super-blocks
    of that many seconds with device-resident carries across sharded
    steps (parallel.temporal.detect_frames_temporal_streaming): host RAM
    is bounded by one super-block, making multi-hour monitoring videos
    tractable; results are bit-equal to the whole-clip mode.

    Accepts a grayscale classic-detector config (the fused M3 step,
    parallel.temporal) or a color MLDetector/dldet config (sharded
    window-max + data-parallel YOLO, parallel.temporal_dldet).
    """
    import jax

    from .parallel.mesh import build_mesh
    from .parallel.temporal import (detect_frames_temporal,
                                    detect_frames_temporal_streaming)
    from .parallel.temporal_dldet import (
        detect_frames_temporal_dldet,
        detect_frames_temporal_dldet_streaming)

    set_default_logger(False, work_mode)
    logger = get_default_logger()
    logger.start()
    try:
        LoaderCls = get_loader(cfg.loader.name)
        WrapperCls = get_wrapper(cfg.loader.wrapper)
        dldet = cfg.detector.name == "MLDetector"
        assert cfg.loader.grayscale != dldet, (
            "temporal batch detection requires a grayscale classic-"
            "detector config, or a color MLDetector (dldet) config")
        start_time, end_time = time_range
        video_loader = LoaderCls(
            WrapperCls, video_name, mask_name=mask_name,
            resize_option=cfg.loader.resize, hwaccel=cfg.loader.hwaccel,
            start_time=start_time, end_time=end_time,
            grayscale=not dldet,
            exp_option=cfg.loader.exp_time,
            exp_upper_bound=cfg.loader.upper_bound,
            merge_func=cfg.loader.merge_func,
            continue_on_err=cfg.loader.continue_on_err)
        video_info = video_loader.summary()
        logger.info(repr(video_loader))
        rt_param = RuntimeParams(
            fps=video_loader.fps, exp_frame=video_loader.exp_frame,
            eq_fps=video_loader.eq_fps, eq_int_fps=video_loader.eq_int_fps,
            exp_time=video_loader.exp_time,
            runtime_size=video_loader.runtime_size,
            raw_size=video_loader.raw_size,
            positive_category_list=ClipCfg.from_json_file(
                get_clip_config_path()).export.positive_category_list)

        n = n_shards or len(jax.devices())
        mesh = build_mesh(n, axis_name="time")
        mask = video_loader.mask if mask_name else None
        video_loader.start()

        def iter_blocks():
            # BlockVideoLoader recycles a fixed pool of block buffers; a
            # retained reference would be overwritten once the producer
            # laps the pool (~pool_size blocks), so copy.
            if hasattr(video_loader, "pop_block"):
                while True:
                    blk = video_loader.pop_block()
                    if blk is None:
                        return
                    yield np.array(blk, copy=True)
            else:
                while not video_loader.stopped:
                    f = video_loader.pop()
                    if f is None:
                        return
                    yield np.array(f[None], copy=True)

        if super_block_sec is not None:
            super_frames = max(int(super_block_sec * rt_param.eq_fps), n)
            stream_fn = (detect_frames_temporal_dldet_streaming if dldet
                         else detect_frames_temporal_streaming)
            records, used = stream_fn(
                iter_blocks(), cfg, fps=rt_param.eq_fps, mask=mask,
                mesh=mesh, super_block_frames=super_frames, logger=logger,
                rt_params=rt_param)
            video_loader.release()
            if dldet:  # mirror temporal_dldet's super-block sizing
                n_win = max(int(cfg.detector.window_sec
                                * rt_param.eq_fps), 1)
                sb_frames = max(super_frames // n, n_win - 1, 1) * n
            else:
                sb_frames = max(super_frames // n * n, n)
            logger.info(f"Streaming temporal detection: {used} merged "
                        f"frames over {n} shards in "
                        f"{-(-used // sb_frames)} super-blocks.")
        else:
            chunks = list(iter_blocks())
            video_loader.release()
            if not chunks:
                raise ValueError("no frames decoded")
            frames = np.concatenate(chunks, axis=0)
            del chunks
            batch_fn = (detect_frames_temporal_dldet if dldet
                        else detect_frames_temporal)
            records, used = batch_fn(
                frames, cfg, fps=rt_param.eq_fps, mask=mask, mesh=mesh,
                logger=logger, rt_params=rt_param)
            logger.info(f"Temporal batch detection: {used} merged frames "
                        f"over {n} shards.")
    finally:
        logger.stop()
    return MDRF(version=VERSION, basic_info=video_info, config=cfg,
                type="prediction", anno_size=video_info.resolution,
                results=records)


def _run_block_loop(video_loader, detector, collector, rt_param, start_frame,
                    work_mode, live_mode, visual_mode, visual_manager,
                    logger, t0, timer=None, resume_idx: int = 0,
                    checkpoint_path: Optional[str] = None,
                    checkpoint_interval_sec: float = 60.0) -> None:
    # Two structural choices driven by TPU economics:
    # 1. ONE block shape per run: compiles are expensive (and uncached
    #    across processes on tunneled backends), so the tail block is
    #    padded by repeating its last frame and padded positions' results
    #    are dropped.
    # 2. Pipelined dispatch/fetch: on a tunneled TPU a device->host fetch
    #    costs ~100ms of pure latency, so blocks are dispatched ahead and
    #    results collected by worker threads -- the fetch roundtrips of
    #    consecutive blocks overlap instead of serializing.
    import collections
    from concurrent.futures import ThreadPoolExecutor
    from .profiling import StageTimer

    if timer is None:
        timer = StageTimer()
    merged_idx = resume_idx
    last_ckpt = time.time()
    e = rt_param.exp_frame
    eq_int_fps = max(rt_param.eq_int_fps, 1)
    block_frames = getattr(video_loader, "block_frames", 64)
    use_async = hasattr(detector, "process_block_async")
    # device compute is ~12ms/64-frame block (traced); wall time is
    # dominated by tunnel round trips (~100ms quiet, seconds contended).
    # device_put and the jitted dispatch are both ASYNC (the 33MB
    # device_put call returns in ~27ms; the RPC streams in the
    # background), so they run inline on the main thread; only the
    # blocking result fetch (np.asarray round trip) needs worker threads,
    # one per inflight block. Keeping uploads out of the collect pool
    # matters: a contended fetch taking seconds must not be able to
    # starve the upload path (the round-1 pipeline shared one executor
    # and serialized on exactly that).
    import os as _os
    pipeline_depth = int(_os.environ.get("METDETPY_TPU_PIPELINE_DEPTH", 6))
    executor = (ThreadPoolExecutor(max_workers=pipeline_depth)
                if use_async else None)
    inflight: "collections.deque" = collections.deque()

    # device_epoch tags each dispatched block with the device-state
    # generation it was issued under; a reset bumps it so that failures
    # of blocks dispatched BEFORE the reset (poisoned by the same
    # transient fault) are zero-filled without counting toward the
    # consecutive-failure abort limit.
    device_epoch = 0

    device_mode = getattr(video_loader, "device_put_mode", False)

    def dispatch(raw_block, submit=True):
        """Enqueue the device step for one block and hand the result
        handle to a collect worker. In loader device_put mode the block
        arrives as an already-uploaded, already-padded (device_array,
        n_real) pair (the decode thread overlapped the transfer);
        otherwise pad + device_put here. With submit=False (deferred
        collection) the raw handle is returned instead of a collect
        future."""
        nonlocal use_async
        if device_mode:
            blk, n_real = raw_block
        else:
            n_real = raw_block.shape[0]
            if n_real < block_frames:
                pad = np.repeat(raw_block[-1:], block_frames - n_real,
                                axis=0)
                blk = np.concatenate([raw_block, pad], axis=0)
            else:
                blk = raw_block
        if use_async:
            import jax
            try:
                handle = detector.process_block_async(
                    blk if device_mode else jax.device_put(blk))
            except NotImplementedError:
                use_async = False
            else:
                if not submit:
                    return handle, blk, n_real, device_epoch
                fut = executor.submit(detector.collect, handle)
                return fut, blk, n_real, device_epoch
        return None, blk, n_real, device_epoch

    progress = None
    if work_mode == "frontend":
        try:
            import tqdm
            total = max((video_loader.iterations // e) - resume_idx, 0)
            progress = tqdm.tqdm(total=total, ncols=100, unit="frame")
        except ImportError:
            pass

    consecutive_failures = 0

    def consume(entry):
        nonlocal merged_idx, last_ckpt, consecutive_failures, device_epoch
        fut, block, n_real, epoch = entry
        try:
            with timer.stage("collect"):
                if fut is not None:
                    results = fut.result()[:n_real]
                else:
                    results = detector.process_block(block)[:n_real]
            consecutive_failures = 0
        except Exception as exc:
            # device/backend failure recovery (SURVEY §5.3; the tunneled
            # TPU occasionally throws transient FAILED_PRECONDITION):
            # drop this block's results, reinitialize the detector's
            # device state (window/EMA warmup restarts; collector history
            # is host-side and survives) and keep going. Persistent
            # failure still aborts.
            if epoch < device_epoch:
                # dispatched before the last reset: one transient fault
                # poisons every already-inflight handle, so these fail
                # back-to-back by construction -- zero-fill them without
                # counting toward the abort limit.
                logger.warning(
                    f"{exc!r} on a pre-reset inflight block; dropped.")
                results = [(np.zeros((0, 4), int),
                            np.zeros((0, detector.num_cls)))] * n_real
            else:
                consecutive_failures += 1
                logger.error(
                    f"{exc!r} while processing a frame block; resetting "
                    f"device state and continuing "
                    f"({consecutive_failures} consecutive failure(s)).")
                if consecutive_failures >= 3 or not hasattr(
                        detector, "reset_device_state"):
                    raise
                detector.reset_device_state()
                device_epoch += 1
                results = [(np.zeros((0, 4), int),
                            np.zeros((0, detector.num_cls)))] * n_real
        timer.add_frames(n_real * e)
        if progress is not None:
            progress.update(n_real)
        return emit_results(results, block, heartbeat=True)

    def emit_results(results, block, heartbeat):
        """Feed one block's per-frame results through the collector (and
        visu/live pacing); shared by the incremental and deferred paths.
        With heartbeat=False the Processing log lines are assumed to have
        been emitted at dispatch time."""
        nonlocal merged_idx
        for j, (lines, cates) in enumerate(results):
            i = start_frame + merged_idx * e
            if (heartbeat and work_mode == "backend"
                    and merged_idx % eq_int_fps == 0):
                logger.processing(str(frame2time(i, rt_param.fps)))
            if len(lines) or merged_idx % eq_int_fps == 0:
                with timer.stage("collector_update"):
                    collector.update(i, lines=lines, cates=cates)
            if visual_mode:
                visu_info = [TextVisu(
                    "timestamp",
                    text_list=[TextColorPair(frame2ts(i, rt_param.fps))],
                    position="left-bottom", color="white")]
                visu_info.extend(detector.visu())
                visu_info.extend(collector.visu(frame_num=i))
                visual_manager.display_a_frame(block[j], visu_info)
                if visual_manager.manual_stop:
                    logger.info("Manual interrupt signal detected.")
                    return False
            merged_idx += 1
        if live_mode:
            expect = (merged_idx * e / rt_param.fps
                      ) * LIVE_MODE_SPEED_CTRL_CONST
            elapsed = time.time() - t0
            if elapsed < expect:
                time.sleep(expect - elapsed)
        return True

    # Deferred collection (default for offline block runs): dispatch
    # every block of a horizon WITHOUT any device->host read, then
    # collect the whole horizon with one stacked fetch per fixed group
    # (detector.collect_many) -- host-device syncs leave the hot loop
    # entirely. An earlier platform gate tried to default this OFF on
    # the axon tunnel (buffered-upload replay concern), but axon reports
    # platform == "tpu", so every recorded run in fact ran deferred-ON
    # -- and performed well (r4/r5 bench ledger); the unreachable gate
    # is gone and ON is the default everywhere. Live mode needs pacing,
    # visual mode needs per-block host frames -- both keep the
    # incremental path. Override with METDETPY_TPU_DEFERRED_COLLECT=0.
    deferred_env = _os.environ.get("METDETPY_TPU_DEFERRED_COLLECT")
    deferred = (use_async and not live_mode and not visual_mode
                and hasattr(detector, "collect_many")
                and deferred_env != "0")
    logger.debug(
        f"Deferred collection: {'on' if deferred else 'off'} "
        f"({'env override' if deferred_env is not None else 'default'})")
    # horizon bound: handles are tiny, but the dispatched-but-unexecuted
    # backlog pins uploaded blocks on device, so cap blocks per horizon;
    # detectors whose handles pin big device arrays (MLDetector's color
    # stacks) declare a tighter cap
    horizon = max(1, int(_os.environ.get("METDETPY_TPU_COLLECT_HORIZON",
                                         128)))
    horizon = min(horizon, getattr(detector, "max_deferred_horizon",
                                   horizon))
    pending: list = []
    dispatched_merged = resume_idx

    def zero_results(n_real):
        return [(np.zeros((0, 4), int),
                 np.zeros((0, detector.num_cls)))] * n_real

    def flush_deferred():
        """Collect every pending handle (one fetch), then emit in order.
        On a horizon-fetch failure, fall back to per-block collection
        with the same epoch-tagged recovery as the incremental path."""
        nonlocal consecutive_failures, device_epoch
        if not pending:
            return True
        entries = list(pending)
        pending.clear()
        try:
            with timer.stage("collect"):
                many = detector.collect_many([en[0] for en in entries])
            consecutive_failures = 0
        except Exception as exc:
            logger.error(f"{exc!r} during horizon collect "
                         f"({len(entries)} blocks); falling back to "
                         f"per-block collection.")
            many = []
            for handle, n_real, epoch in entries:
                try:
                    with timer.stage("collect"):
                        many.append(detector.collect(handle))
                    consecutive_failures = 0
                except Exception as exc2:
                    if epoch < device_epoch:
                        logger.warning(f"{exc2!r} on a pre-reset "
                                       f"inflight block; dropped.")
                    else:
                        consecutive_failures += 1
                        logger.error(
                            f"{exc2!r} while collecting a frame block; "
                            f"resetting device state and continuing "
                            f"({consecutive_failures} consecutive "
                            f"failure(s)).")
                        if consecutive_failures >= 3 or not hasattr(
                                detector, "reset_device_state"):
                            raise
                        detector.reset_device_state()
                        device_epoch += 1
                    many.append(zero_results(n_real))
        for (handle, n_real, epoch), results in zip(entries, many):
            timer.add_frames(n_real * e)
            if progress is not None:
                progress.update(n_real)
            if emit_results(results[:n_real], None,
                            heartbeat=False) is False:
                return False
        return True

    stopped = False
    try:
        while not stopped:
            with timer.stage("decode_wait"):
                raw_block = video_loader.pop_block()
            if raw_block is None:
                break
            if deferred:
                with timer.stage("dispatch"):
                    entry = dispatch(raw_block, submit=False)
                if not use_async:
                    # detector can't run async: abandon deferred mode
                    # (pending is empty -- the fallback raises on the
                    # first dispatch, before anything was deferred)
                    deferred = False
                    stopped = flush_deferred() is False
                    inflight.append(entry)
                    continue
                handle, _blk, n_real, epoch = entry
                if hasattr(detector, "handle_slim"):
                    handle = detector.handle_slim(handle)
                if work_mode == "backend":
                    # heartbeat at dispatch granularity (results arrive
                    # in a burst at the horizon fetch)
                    logger.processing(str(frame2time(
                        start_frame + dispatched_merged * e,
                        rt_param.fps)))
                dispatched_merged += n_real
                pending.append((handle, n_real, epoch))
                if len(pending) >= horizon and not flush_deferred():
                    stopped = True
            else:
                with timer.stage("dispatch"):
                    inflight.append(dispatch(raw_block))
                while len(inflight) >= pipeline_depth:
                    if consume(inflight.popleft()) is False:
                        stopped = True
                        break
            if (checkpoint_path and not stopped
                    and time.time() - last_ckpt >= checkpoint_interval_sec):
                # drain the pipeline BEFORE snapshotting: detector device
                # carries advance at dispatch time, so a snapshot taken
                # with blocks still inflight would be ahead of the
                # collector/frame cursor, and a resume would replay frames
                # against a window history containing their own future
                if deferred:
                    stopped = flush_deferred() is False
                while inflight:
                    if consume(inflight.popleft()) is False:
                        stopped = True
                        break
                if not stopped:
                    from .checkpoint import save_checkpoint
                    with timer.stage("checkpoint"):
                        save_checkpoint(checkpoint_path, detector,
                                        collector, merged_idx)
                    last_ckpt = time.time()
        if not stopped and deferred:
            stopped = flush_deferred() is False
        while inflight and not stopped:
            if consume(inflight.popleft()) is False:
                break
    finally:
        if executor is not None:
            executor.shutdown(wait=True)
        if progress is not None:
            progress.close()
        if checkpoint_path:
            from .checkpoint import save_checkpoint
            save_checkpoint(checkpoint_path, detector, collector, merged_idx)


def _run_frame_loop(video_loader, detector, collector, rt_param, start_frame,
                    end_frame, work_mode, live_mode, visual_mode,
                    visual_manager, logger, t0) -> None:
    eq_int_fps = max(rt_param.eq_int_fps, 1)
    for prog_int, i in enumerate(
            range(start_frame, end_frame, rt_param.exp_frame)):
        if work_mode == "backend" and prog_int % eq_int_fps == 0:
            logger.processing(str(frame2time(i, rt_param.fps)))
        x = video_loader.pop()
        if video_loader.stopped or x is None:
            break
        detector.update(x)
        lines, cates = detector.detect()
        if len(lines) or prog_int % eq_int_fps == 0:
            collector.update(i, lines=lines, cates=cates)
        if visual_mode:
            visu_info = [TextVisu(
                "timestamp",
                text_list=[TextColorPair(frame2ts(i, rt_param.fps))],
                position="left-bottom", color="white")]
            visu_info.extend(detector.visu())
            visu_info.extend(collector.visu(frame_num=i))
            visual_manager.display_a_frame(x, visu_info)
            if visual_manager.manual_stop:
                logger.info("Manual interrupt signal detected.")
                return
        if live_mode:
            expect = (prog_int * rt_param.exp_frame / rt_param.fps
                      ) * LIVE_MODE_SPEED_CTRL_CONST
            elapsed = time.time() - t0
            if elapsed < expect:
                time.sleep(expect - elapsed)
