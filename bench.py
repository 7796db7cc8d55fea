#!/usr/bin/env python3
"""Benchmark suite: variant-calling end-to-end + polish + realigner.

Primary metric (the headline JSON line): END-TO-END `call_variant` Mbp/s —
all three stages on synthetic ONT-like data (10 Mbp over 5 contigs, 35x
coverage, 10 kb reads, 8% error; median of 3 runs) with the streamed
encode->inference pipeline (runtime/streaming.py) feeding the real jitted
model on the available accelerator, candidate gates and the native
5-file VCF sink running behind the device.

Baseline (vs_baseline): the reference's deployment model on THIS host —
N caller processes each running 1-thread CPU RNN inference
(predict_distributed_cpu.py:45-57,200-213) over the same multi-threaded
host encode, plus the same stage-3 cost. Torch throughput is measured
1-thread and scaled by the host's core count (the reference stripes
callers across cores; scaling is linear by construction since callers
share nothing).

Also reported (stderr): encode thread-scaling curve, device-only inference
throughput, chip idle fraction removed by streaming, polish-mode
consensus+stitch Mbp/s, and realigner windows/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# dataset scale: 10 Mbp over 5 contigs by default (VERDICT r3: 1 Mbp
# timings on this noisy 2-core microVM could not distinguish regression
# from noise); PEPPER_BENCH_MBP=1 keeps the quick variant for smoke runs
GENOME_MBP = float(os.environ.get("PEPPER_BENCH_MBP", "10.0"))
N_CONTIGS = max(1, min(5, int(GENOME_MBP)))
COVERAGE = 35
READ_LEN = 10000
ERROR = 0.08
BATCH = 512
E2E_RUNS = int(os.environ.get("PEPPER_BENCH_RUNS", "3"))


def log(msg):
    sys.stderr.write(f"[bench] {msg}\n")
    sys.stderr.flush()


def get_dataset():
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads_fast, write_dataset)
    key = hashlib.md5(
        f"{GENOME_MBP}-{N_CONTIGS}-{COVERAGE}-{READ_LEN}-{ERROR}-v2"
        .encode()).hexdigest()[:10]
    cache = f"/tmp/pepper_bench_{key}"
    fasta, bam = cache + "/ref.fa", cache + "/reads.bam"
    if not (os.path.isfile(fasta) and os.path.isfile(bam)):
        os.makedirs(cache, exist_ok=True)
        t0 = time.time()
        genome = random_genome(int(GENOME_MBP * 1e6 / N_CONTIGS), seed=1,
                               n_contigs=N_CONTIGS)
        per_mbp = int(GENOME_MBP)
        variants = plant_variants(dict(genome), 800 * per_mbp, 100 * per_mbp,
                                  100 * per_mbp, seed=2)
        records = simulate_reads_fast(genome, variants, coverage=COVERAGE,
                                      read_length=READ_LEN, error_rate=ERROR,
                                      seed=3)
        write_dataset(cache, genome, records)
        log(f"dataset built in {time.time() - t0:.1f}s ({len(records)} reads)")
    return cache, fasta, bam


def bench_config(fasta, bam, threads):
    from pepper_tpu.options import PipelineConfig
    from pepper_tpu.presets import set_parameters
    return set_parameters(PipelineConfig(
        bam=bam, fasta=fasta, sub_command="call_variant",
        ont_r9_guppy5_sup=True, threads=threads))


def encode_all(fasta_path, bam_path, n_threads):
    """Host stage alone: the pipeline's own region encode over every 100kb
    region; returns candidate images. Used for the thread-scaling curve and
    the torch-baseline input."""
    from concurrent.futures import ThreadPoolExecutor

    from pepper_tpu.io.bam_reader import BamReader
    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.pipelines.make_images import create_region_summary

    config = bench_config(fasta_path, bam_path, n_threads)
    with FastaReader(fasta_path) as fa:
        regions = []
        for contig in fa.get_chromosome_names():
            length = fa.get_chromosome_sequence_length(contig)
            regions += [(contig, s, min(s + 100_000, length) - 1)
                        for s in range(0, length, 100_000)]

    def one(region):
        contig, start, end = region
        with BamReader(bam_path) as bam, FastaReader(fasta_path) as fa:
            return create_region_summary(config, bam, fa, contig, start, end)

    with ThreadPoolExecutor(n_threads) as pool:
        results = list(pool.map(one, regions))
    from pepper_tpu.pipelines.datastore import stack_images
    batches = [stack_images(r) for r in results if r]
    return (np.concatenate(batches).astype(np.int8) if batches
            else np.zeros((0, 33, 26), np.int8))


def make_model(cache):
    import jax
    from pepper_tpu.models.checkpoint import save_checkpoint
    from pepper_tpu.models.variant_model import init_variant_params
    path = cache + "/bench_model.npz"
    if not os.path.isfile(path):
        params = init_variant_params(jax.random.PRNGKey(0))
        save_checkpoint(path, jax.tree_util.tree_map(np.asarray, params), {})
    return path


def bench_e2e(cache, fasta, bam, n_threads):
    """Full call_variant: streamed encode+inference with stage-3 gates AND
    ordered VCF emission running behind the device (the production
    single-host path); the tail is just the final flush + file close.
    Returns (t_stream, t_tail, n_candidates)."""
    from pepper_tpu.pipelines.find_candidates import (
        StreamingCandidateCollector, make_ordered_emitter)
    from pepper_tpu.pipelines.make_images import build_intervals
    from pepper_tpu.runtime.streaming import stream_inference

    config = bench_config(fasta, bam, n_threads)
    config.model_path = make_model(cache)
    intervals = build_intervals(config)
    intervals.sort(key=lambda iv: (iv[0], iv[1]))

    out = cache + "/e2e_out"
    shutil.rmtree(out, ignore_errors=True)
    pred_dir = out + "/preds/"
    os.makedirs(pred_dir)
    pred_path = pred_dir + "pepper_predictions.hdf"
    t0 = time.time()
    emitter = make_ordered_emitter(config, out + "/", intervals)
    collector = StreamingCandidateCollector(config, emitter)
    # the resume journal is on in production call_variant — include its
    # cost in the headline number
    journal = out + "/resume.journal"
    n = stream_inference(config, intervals, pred_path,
                         candidate_collector=collector,
                         resume_journal=journal)
    t_stream = time.time() - t0
    t0 = time.time()
    collector.finish()
    emitter.finish()
    os.remove(journal)
    t_tail = time.time() - t0
    from pepper_tpu.utils import streamstats
    return t_stream, t_tail, n, streamstats.CURRENT


def tpu_inference_only(images):
    """Device-only throughput (the chip's ceiling)."""
    import jax
    import jax.numpy as jnp
    from pepper_tpu.models.variant_model import (init_variant_params,
                                                 variant_forward)
    device_batch = 4096
    params = init_variant_params(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), params)

    @jax.jit
    def fwd(p, x):
        return variant_forward(p, x.astype(jnp.bfloat16)).astype(jnp.float32)

    x = images.astype(np.int8)
    pad = (-len(x)) % device_batch
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], np.int8)])
    flops_per_window = None
    try:  # XLA's own FLOP count for the compiled forward
        compiled = fwd.lower(params, jnp.asarray(x[:device_batch])).compile()
        flops_per_window = compiled.cost_analysis()["flops"] / device_batch
    except Exception:
        pass
    jax.block_until_ready(fwd(params, jnp.asarray(x[:device_batch])))
    reps = 3   # sub-0.1s single passes read as >100% of peak otherwise
    t0 = time.time()
    for _ in range(reps):
        outs = [fwd(params, jnp.asarray(x[lo:lo + device_batch]))
                for lo in range(0, len(x), device_batch)]
        jax.block_until_ready(outs)
    return (time.time() - t0) / reps, jax.devices()[0].platform, \
        flops_per_window


def torch_cpu_inference(images):
    """1-thread torch throughput, timed on a subset and scaled — the
    per-caller setup of the reference's CPU runtime."""
    import torch
    torch.set_num_threads(1)
    from tests.test_models import TorchVariantModel
    model = TorchVariantModel().eval()
    subset = images[:min(4096, len(images))].astype(np.float32)
    pad = (-len(subset)) % BATCH
    x = np.concatenate([subset, np.zeros((pad,) + subset.shape[1:],
                                         np.float32)]) if pad else subset
    with torch.no_grad():
        model(torch.from_numpy(x[:BATCH]))  # warmup
        dt = float("inf")
        for _ in range(2):   # best-of-2: host steal would inflate the
            t0 = time.time()  # BASELINE (flattering us) otherwise
            for lo in range(0, len(x), BATCH):
                model(torch.from_numpy(x[lo:lo + BATCH]))
            dt = min(dt, time.time() - t0)
    return dt * len(images) / max(1, len(x))


def bench_polish(n_threads):
    """Polish mode: make_images -> consensus -> stitch on a 100 kb draft
    with 30x reads; returns Mbp/s through all three stages."""
    import jax
    from pepper_tpu.models.checkpoint import save_checkpoint
    from pepper_tpu.models.polish_model import init_polish_params
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads_fast, write_dataset)

    size = 300_000
    cache = "/tmp/pepper_bench_polish_v2"
    if not os.path.isfile(cache + "/reads.bam"):
        os.makedirs(cache, exist_ok=True)
        genome = random_genome(size, seed=11)    # the DRAFT
        edits = plant_variants(dict(genome), 60, 15, 15, seed=12)
        edits = [type(v)(v.contig, v.pos, v.ref, v.alt, (1, 1))
                 for v in edits]                 # draft errors are hom-alt
        records = simulate_reads_fast(genome, edits, coverage=30,
                                      read_length=8000, error_rate=0.06,
                                      seed=13)
        write_dataset(cache, genome, records)
    model = cache + "/polish_model.npz"
    if not os.path.isfile(model):
        params = init_polish_params(jax.random.PRNGKey(1))
        save_checkpoint(model, jax.tree_util.tree_map(np.asarray, params), {})
    out = cache + "/out"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    from pepper_tpu.polish.make_images import build_polish_intervals
    from pepper_tpu.polish.stitch import StreamingStitcher
    from pepper_tpu.polish.streaming import stream_polish

    from pepper_tpu.native import bamio as _bamio
    _bamio.polish_prof()   # drain
    t0 = time.time()
    pred_dir = out + "/preds"
    os.makedirs(pred_dir)
    intervals = build_polish_intervals(cache + "/ref.fa",
                                       cache + "/reads.bam", None)
    stitcher = StreamingStitcher(intervals,
                                 out + "/polished_pepper_polished.fa")
    journal = out + "/polish_resume.journal"   # production default is on
    n_seqs = stream_polish(cache + "/reads.bam", cache + "/ref.fa", model,
                           pred_dir + "/pepper_prediction_0.hdf",
                           threads=n_threads, stitcher=stitcher,
                           resume_journal=journal)
    t_stream = time.time() - t0
    t0 = time.time()
    stitcher.finish()   # watermark already wrote everything but the tail
    os.remove(journal)
    t_stitch = time.time() - t0

    from pepper_tpu.utils import streamstats
    nat = _bamio.polish_prof() or {}
    dt = t_stream + t_stitch
    return (size / 1e6 / dt, (t_stream, t_stitch), n_seqs,
            streamstats.CURRENT, nat)


def torch_polish_window_inference(n_seqs):
    """The reference's polish consensus per-caller cost: 1-thread torch,
    19 sliding windows with hidden carry + softmax vote per 1000-length
    sequence (predict_distributed_cpu.py:43-81), timed on a subset and
    scaled to all sequences."""
    import torch
    torch.set_num_threads(1)
    from tests.test_models import TorchPolishModel
    model = TorchPolishModel().eval()
    sample = max(1, min(n_seqs, 128))
    x = torch.rand(sample, 1000, 10)
    with torch.no_grad():
        model(x[:, :100], torch.zeros(sample, 2, 128))  # warmup
        dt = float("inf")
        for _ in range(2):   # best-of-2 (same rationale as the variant
            t0 = time.time()  # baseline: steal must not flatter us)
            hidden = torch.zeros(sample, 2, 128)
            for s in range(0, 901, 50):
                out, hidden = model(x[:, s:s + 100], hidden)
                torch.nn.functional.softmax(out, dim=2)
            dt = min(dt, time.time() - t0)
    return dt * n_seqs / sample


def bench_train_step(bs: int = 512, iters: int = 60):
    """Variant-model training throughput: our jitted fwd+bwd+Adam step on
    the accelerator vs the same step in torch on 1 CPU thread (the
    per-worker setup of the reference's trainer)."""
    import jax
    import jax.numpy as jnp
    from pepper_tpu.models.variant_model import init_variant_params
    from pepper_tpu.train.variant_train import make_optimizer, make_train_step

    rng = np.random.RandomState(9)
    images = rng.randint(-125, 126, (bs, 33, 26)).astype(np.float32)
    labels = rng.randint(0, 3, bs)
    opt = make_optimizer(1e-6)
    step = make_train_step(opt)
    params = init_variant_params(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    x, y = jnp.asarray(images), jnp.asarray(labels)
    key = jax.random.PRNGKey(1)
    params, opt_state, _ = step(params, opt_state, x, y, key)  # compile
    jax.block_until_ready(params)
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, x, y, key)
    jax.block_until_ready(params)  # the full final state, not just loss
    t_step = (time.time() - t0) / iters

    import torch
    torch.set_num_threads(1)
    from tests.test_models import TorchVariantModel
    model = TorchVariantModel().train()
    optim = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=1e-6)
    tx = torch.from_numpy(images)
    ty = torch.from_numpy(labels.astype(np.int64))
    ce = torch.nn.CrossEntropyLoss(reduction="sum")
    def torch_step():
        # timing baseline: same tensor work as the reference's train loop
        # (its model returns type logits under train_mode; the softmax
        # head here is compute-equivalent)
        optim.zero_grad()
        loss = ce(model(tx), ty)
        loss.backward()
        optim.step()
    torch_step()  # warmup
    t0 = time.time()
    for _ in range(3):
        torch_step()
    t_torch = (time.time() - t0) / 3
    return t_step, t_torch, bs


def bench_realigner():
    """The polish image-gen realignment hot path at reference-like load:
    1500 reads x 1 kb window (the workload of the reference's k-mer +
    striped-SW realigner, pepper/modules/src/local_reassembly/aligner.h)."""
    from pepper_tpu.io.bam_reader import TrimmedRead
    from pepper_tpu.polish.realign import align_reads_to_reference
    from tests.util.synth import random_genome

    rng = np.random.RandomState(5)
    ref = random_genome(1000, seed=5)[0][1]
    reads = []
    bases = "ACGT"
    for i in range(1500):
        lo = int(rng.randint(0, 500))
        hi = min(1000, lo + 400 + int(rng.randint(0, 200)))
        seq = list(ref[lo:hi])
        for j in range(len(seq)):  # ~6% errors
            if rng.rand() < 0.06:
                seq[j] = bases[rng.randint(4)]
        seq = "".join(seq)
        reads.append(TrimmedRead(
            query_name=f"r{i}", pos=lo, pos_end=lo + len(seq), sequence=seq,
            base_qualities=[20] * len(seq), cigar_tuples=[(0, len(seq))],
            mapping_quality=60, flags=0, hp_tag=0, bad_indices=[]))
    t0 = time.time()
    aligned = align_reads_to_reference(reads, ref, 0)
    dt = time.time() - t0
    return 1500 / dt, dt, len(aligned)


def main():
    cache, fasta, bam = get_dataset()

    # ---- encode thread-scaling curve (and warm the page cache) ----------
    ncpu = os.cpu_count() or 2
    encode_all(fasta, bam, ncpu)  # warmup: lazily-provisioned microVM pages
    curve = {}
    for t in sorted({1, 2, ncpu} | ({4} if ncpu >= 4 else set())):
        best = float("inf")
        for _ in range(3):   # best-of-3: this host's steal spikes are 2-5x
            t0 = time.time()
            images = encode_all(fasta, bam, t)
            best = min(best, time.time() - t0)
        curve[t] = best
    t_host = curve[ncpu]
    log("encode scaling: " + ", ".join(
        f"{t}th={curve[t]:.2f}s" for t in sorted(curve)))
    log(f"host fetch+encode ({ncpu} threads): {t_host:.2f}s, "
        f"{len(images)} candidate windows; per-core encode cost "
        f"{curve[1] / GENOME_MBP:.3f} core-s/Mbp")

    # ---- device ceiling --------------------------------------------------
    t_dev, platform, flops_w = tpu_inference_only(images)
    windows_s = len(images) / max(t_dev, 1e-9)
    log(f"device inference ({platform}): {t_dev:.3f}s "
        f"({windows_s:.0f} windows/s)")
    if flops_w and platform == "tpu":
        # v5e peak ~197 bf16 TFLOP/s: how far the RNN forward sits from
        # speed-of-light on this chip (it is bandwidth/latency-bound, so
        # this tracks the gap, not a target of 100%)
        util = windows_s * flops_w / 197e12
        log(f"chip utilization: {flops_w / 1e6:.1f} MFLOP/window x "
            f"{windows_s:.0f}/s = {100 * util:.1f}% of v5e bf16 peak")

    # ---- full pipeline, streamed (warm pass then median of E2E_RUNS) ----
    bench_e2e(cache, fasta, bam, ncpu)  # compile + page warmup
    runs = []
    for _ in range(E2E_RUNS):
        s, c3, n_cand, stats = bench_e2e(cache, fasta, bam, ncpu)
        runs.append((s, c3, stats))
    runs.sort(key=lambda p: p[0] + p[1])
    t_stream, t_tail, stats = runs[len(runs) // 2]   # median by total
    t_e2e = t_stream + t_tail
    ours = GENOME_MBP / t_e2e
    spread = (runs[-1][0] + runs[-1][1]) - (runs[0][0] + runs[0][1])
    log(f"e2e call_variant (streamed 3-stage, median of {E2E_RUNS}, "
        f"spread {spread:.2f}s): {t_e2e:.2f}s = stream+gates+vcf "
        f"{t_stream:.2f}s + tail {t_tail:.2f}s ({n_cand} candidates) "
        f"-> {ours:.3f} Mbp/s")
    log(f"full-pipeline cost over pure encode: "
        f"{100 * (t_stream / t_host - 1):.0f}% — the stream carries "
        f"stages 2+3 (inference, gates, VCF write, resume journal) behind "
        f"the encode; chip work hidden: {t_dev:.3f}s")
    # stream-internal attribution (median run): every host component's
    # busy time inside the stream; on this {ncpu}-core host wall ~=
    # total/{ncpu} once the device is hidden
    log(f"stream breakdown (core-seconds, median run; wall ~= "
        f"total/{ncpu}): {stats.summary()} | TOTAL {stats.total():.2f}s "
        f"(vs e2e wall {t_e2e:.2f}s x {ncpu} cores = "
        f"{t_e2e * ncpu:.2f} core-s)")

    # ---- reference-style baseline on this host ---------------------------
    # the reference runs stage 3 post hoc over the prediction files; time
    # that serial pass (same vectorized gates) for the baseline's tail
    from pepper_tpu.pipelines.find_candidates import process_candidates
    config = bench_config(fasta, bam, ncpu)
    t0 = time.time()
    process_candidates(config, cache + "/e2e_out/preds/",
                       cache + "/e2e_out/posthoc/")
    t_stage3_posthoc = time.time() - t0
    log(f"post-hoc stage 3 (reference staging): {t_stage3_posthoc:.2f}s")

    # ---- stage-time breakdown (components standalone, serial) -----------
    try:
        from pepper_tpu.io.fasta import FastaReader
        from pepper_tpu.pipelines import find_candidates as fc
        from pepper_tpu.pipelines.datastore import PredictionStore
        pred_path = cache + "/e2e_out/preds/pepper_predictions.hdf"
        batches = []
        with PredictionStore(pred_path, "r") as store:
            for bname in store.batch_names():
                batches.append(store.read_batch(bname))
        t0 = time.time()
        with FastaReader(fasta) as fa:
            span = fc._ContigSpanCache(fa)
            margin, dv = [], []
            for b in batches:
                freq_lists = [[int(f)]
                              for f in np.ravel(b.candidate_frequency)]
                fc.batch_candidates(config, span, b.contigs, b.positions,
                                    b.depths, b.candidates, freq_lists,
                                    b.base_prediction, margin, dv)
        t_gates = time.time() - t0
        t0 = time.time()
        vcf_dir = cache + "/e2e_out/bd_vcf/"
        shutil.rmtree(vcf_dir, ignore_errors=True)
        os.makedirs(vcf_dir)
        fc.finalize_candidates(config, vcf_dir, margin, dv, t0)
        t_vcf = time.time() - t0
        log(f"stage breakdown (components timed standalone at "
            f"{GENOME_MBP:g} Mbp; encode is the {ncpu}-thread wall time, "
            f"gates+vcf the PYTHON tuple engine's serial wall — the "
            f"streamed e2e uses the columnar native sink instead, "
            f"measured in the stream breakdown above): encode "
            f"{t_host:.2f}s | device {t_dev:.2f}s | gates {t_gates:.2f}s "
            f"| vcf write {t_vcf:.2f}s | e2e wall {t_e2e:.2f}s")
    except Exception as exc:
        log(f"stage breakdown failed: {exc}")

    t_torch1 = torch_cpu_inference(images)
    t_torch_n = t_torch1 / ncpu  # N share-nothing 1-thread callers
    baseline_e2e = t_host + t_torch_n + t_stage3_posthoc
    baseline = GENOME_MBP / baseline_e2e
    log(f"torch-cpu 1-thread inference: {t_torch1:.1f}s; emulated "
        f"{ncpu}-caller deployment: {t_torch_n:.1f}s "
        f"-> reference-style e2e {baseline:.3f} Mbp/s")

    # ---- polish workload --------------------------------------------------
    try:
        _, cold_split, _, _, _ = bench_polish(ncpu)  # cold: includes compile
        warm = sorted((bench_polish(ncpu) for _ in range(3)),
                      key=lambda r: sum(r[1]))
        polish_mbps, split, n_seqs, pstats, pnat = warm[1]  # median of 3
        t_stream, t_stitch = split
        polish_dt = sum(split)
        cold_dt = sum(cold_split)
        log(f"polish e2e (300kb draft): {polish_dt:.1f}s warm (streamed "
            f"pileup+consensus {t_stream:.1f}s + stitch {t_stitch:.1f}s) / "
            f"{cold_dt:.1f}s cold (compile+load {cold_dt - polish_dt:.1f}s) "
            f"-> {polish_mbps:.3f} Mbp/s ({n_seqs} sequences)")
        log(f"polish stream breakdown (core-seconds, median run): "
            f"{pstats.summary()} | native encode split: "
            f"fetch {pnat.get('fetch', 0):.2f}s | realign "
            f"{pnat.get('realign', 0):.2f}s | pileup "
            f"{pnat.get('pileup', 0):.2f}s")
        # reference-style polish deployment on this host: the staged image
        # gen (~= our stream's host side) + stitch, consensus = N 1-thread
        # torch window loops on top
        t_torch_polish = torch_polish_window_inference(n_seqs)
        t_ref_polish = t_stream + t_stitch + t_torch_polish / ncpu
        polish_vs = t_ref_polish / polish_dt
        log(f"torch-cpu polish window loop: {t_torch_polish:.1f}s 1-thread; "
            f"emulated {ncpu}-caller consensus {t_torch_polish / ncpu:.1f}s "
            f"-> polish vs_baseline {polish_vs:.2f}x (ref-style e2e "
            f"{0.3 / t_ref_polish:.3f} Mbp/s)")
    except Exception as exc:
        log(f"polish bench failed: {exc}")

    # ---- training step throughput ----------------------------------------
    try:
        t_step, t_torch_step, bs = bench_train_step()
        log(f"train step (batch {bs}): {1e3 * t_step:.1f} ms/step device "
            f"({bs / t_step:.0f} ex/s) vs torch-cpu 1-thread "
            f"{1e3 * t_torch_step:.1f} ms/step -> "
            f"{t_torch_step / t_step:.1f}x")
    except Exception as exc:
        log(f"train bench failed: {exc}")

    # ---- realigner --------------------------------------------------------
    try:
        rps, rdt, n_aligned = bench_realigner()
        log(f"realigner (1500 reads x 1kb): {rdt:.2f}s "
            f"({rps:.0f} reads/s, {n_aligned} aligned)")
    except Exception as exc:
        log(f"realigner bench failed: {exc}")

    # ---- real-data acceptance (HG002 chr20 quickstart) -------------------
    # Attempt the quickstart download + acceptance run every bench round so
    # the committed artifact documents whether real sequencing data has
    # EVER flowed through this framework (VERDICT r4 missing #1). Offline /
    # no-model environments record an explicit, loud SKIP instead.
    try:
        import glob as _glob

        from pepper_tpu.utils.acceptance import run_acceptance
        data_dir = os.environ.get("PEPPER_QUICKSTART_DIR",
                                  "/tmp/pepper_quickstart")
        model_path = os.environ.get("PEPPER_ACCEPT_MODEL")
        if not model_path:
            pkls = _glob.glob(os.path.join(data_dir, "*.pkl")) \
                + _glob.glob(os.path.join(data_dir, "*.npz"))
            model_path = pkls[0] if pkls else None
        rc = run_acceptance(data_dir, model_path, cache + "/acceptance_out",
                            threads=ncpu,
                            expected=os.environ.get("PEPPER_ACCEPT_EXPECTED"),
                            download=True)
        log(f"acceptance rc={rc} ([acceptance] lines above carry the "
            f"F1s, or SKIPPED when data/network/model are unavailable "
            f"— in that case real-data accuracy remains UNMEASURED)")
    except Exception as exc:
        log(f"acceptance step failed: {exc}")

    print(json.dumps({
        "metric": "variant_e2e_throughput",
        "value": round(ours, 4),
        "unit": "Mbp/s",
        "vs_baseline": round(ours / baseline, 3),
    }))


if __name__ == "__main__":
    main()
