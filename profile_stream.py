#!/usr/bin/env python3
"""Profile the streamed call_variant path (host-side costs; CPU platform).

Usage: JAX_PLATFORMS=cpu python profile_stream.py [--mbp 1]
Times pipeline variants differentially (the hot work lives on producer /
flusher / collector threads, where cProfile can't see), then micro-times
the stage-3 components standalone. Developer tool for VERDICT r3 item 1;
not part of the bench.
"""
import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def stub_device(on: bool):
    """Replace the device forward with a constant — on the real TPU the
    forward hides behind the stream (0.05s total), so host-side overhead
    must be measured with the device cost removed; the CPU backend's slow
    RNN would otherwise swamp the numbers."""
    from pepper_tpu.runtime import streaming as rs
    if not hasattr(stub_device, "_orig"):
        stub_device._orig = rs.DeviceRunner.submit
    if on:
        rs.DeviceRunner.submit = lambda self, images8: np.full(
            (self.batch, 3), 1 / 3, np.float32)
    else:
        rs.DeviceRunner.submit = stub_device._orig


def run_stream(cache, fasta, bam, threads, with_collector, with_emitter,
               with_store=True):
    from pepper_tpu.pipelines.find_candidates import (
        StreamingCandidateCollector, make_ordered_emitter)
    from pepper_tpu.pipelines.make_images import build_intervals
    from pepper_tpu.runtime.streaming import stream_inference
    import bench

    config = bench.bench_config(fasta, bam, threads)
    config.model_path = bench.make_model(cache)
    intervals = build_intervals(config)
    intervals.sort(key=lambda iv: (iv[0], iv[1]))
    out = cache + "/prof_out"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out + "/preds/")
    pred_path = out + "/preds/pepper_predictions.hdf"

    t0 = time.time()
    emitter = make_ordered_emitter(config, out + "/", intervals) \
        if with_emitter else None
    collector = StreamingCandidateCollector(config, emitter) \
        if with_collector else None
    n = stream_inference(config, intervals, pred_path,
                         candidate_collector=collector)
    t_stream = time.time() - t0
    t0 = time.time()
    if collector is not None:
        collector.finish()
    if emitter is not None:
        emitter.finish()
    t_tail = time.time() - t0
    return t_stream, t_tail, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=1.0)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 2)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.environ["PEPPER_BENCH_MBP"] = str(args.mbp)
    import bench
    bench.GENOME_MBP = args.mbp
    cache, fasta, bam = bench.get_dataset()

    import jax
    jax.config.update("jax_platforms", "cpu")

    # ---- pure encode (the floor) ----------------------------------------
    t0 = time.time()
    images = bench.encode_all(fasta, bam, args.threads)   # warm pages
    print(f"encode warmup: {time.time() - t0:.2f}s ({len(images)} windows)")
    t0 = time.time()
    bench.encode_all(fasta, bam, args.threads)
    t_encode = time.time() - t0
    print(f"pure encode ({args.threads}th): {t_encode:.2f}s")

    # ---- stream variants, device stubbed (median of reps) ----------------
    stub_device(True)
    variants = [("stream only (no stage3)", False, False),
                ("stream + collector (gates, no vcf)", True, False),
                ("stream + collector + ordered vcf", True, True)]
    run_stream(cache, fasta, bam, args.threads, False, False)  # warm
    for name, wc, we in variants:
        times = []
        for _ in range(args.reps):
            s, t, n = run_stream(cache, fasta, bam, args.threads, wc, we)
            times.append((s, t))
        times.sort(key=lambda p: p[0] + p[1])
        s, t = times[len(times) // 2]
        print(f"{name}: stream={s:.2f}s tail={t:.2f}s "
              f"(overhead vs encode {100 * (s / t_encode - 1):.0f}%) n={n}")
    stub_device(False)

    # ---- stage-3 components standalone ----------------------------------
    from pepper_tpu.pipelines import find_candidates as fc
    from pepper_tpu.pipelines.datastore import PredictionStore
    from pepper_tpu.io.fasta import FastaReader

    config = bench.bench_config(fasta, bam, args.threads)
    # rebuild the prediction batches the stream produced
    pred_path = cache + "/prof_out/preds/pepper_predictions.hdf"
    batches = []
    with PredictionStore(pred_path, "r") as store:
        for bname in store.batch_names():
            batches.append(store.read_batch(bname))
    print(f"{len(batches)} prediction batches on disk")

    t0 = time.time()
    with FastaReader(fasta) as fa:
        span = fc._ContigSpanCache(fa)
        margin, dv = [], []
        for b in batches:
            freq_lists = [[int(f)] for f in np.ravel(b.candidate_frequency)]
            fc.batch_candidates(config, span, b.contigs, b.positions,
                                b.depths, b.candidates, freq_lists,
                                b.base_prediction, margin, dv)
    print(f"gates (batch_candidates) over all batches: "
          f"{time.time() - t0:.2f}s -> {len(margin)} margin, {len(dv)} dv")

    t0 = time.time()
    out_dir = cache + "/prof_vcf/"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    fc.finalize_candidates(config, out_dir, margin, dv, t0)
    print(f"aggregate+vcf write (finalize_candidates): "
          f"{time.time() - t0:.2f}s")

    # HDF5 prediction-store write cost alone
    t0 = time.time()
    tmp_pred = cache + "/prof_predwrite.hdf"
    if os.path.exists(tmp_pred):
        os.remove(tmp_pred)
    with PredictionStore(tmp_pred, "w") as store:
        for i, b in enumerate(batches):
            store.write_prediction(i, b.contigs, b.positions, b.depths,
                                   b.candidates,
                                   np.asarray(b.candidate_frequency),
                                   b.base_prediction)
    print(f"prediction HDF5 write alone: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
