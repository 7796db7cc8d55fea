#!/usr/bin/env python3
"""Chromosome-scale dress rehearsal for the streamed call_variant path.

VERDICT r4 #2: everything before round 5 ran at <= 10 Mbp; the at-scale
claims (bounded RSS, store/journal growth, watermark lag, resume) were
extrapolations. This script runs the real CLI at chr20-like scale
(default 60 Mbp over 3 contigs, ~30x, 10 kb reads) and reports:

  - e2e wall + Mbp/s (full streamed 3-stage pipeline, resume journal on)
  - peak RSS of the pipeline process (sampled from /proc)
  - prediction-store and resume-journal sizes on disk
  - watermark lag: wall time from the last flushed batch to the final
    VCF close (the stream's "tail")
  - a kill -9 at ~50% of the stream followed by a resume that must be
    BYTE-IDENTICAL to the uninterrupted run

Writes one JSON blob to SCALE_r05.json (or $PEPPER_SCALE_OUT) and prints
it; run on the bench host with the TPU visible (or JAX_PLATFORMS=cpu).
"""
import glob
import hashlib
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MBP = float(os.environ.get("PEPPER_SCALE_MBP", "60"))
N_CONTIGS = int(os.environ.get("PEPPER_SCALE_CONTIGS", "3"))
COVERAGE = 30
READ_LEN = 10_000
ERROR = 0.08


def log(msg):
    sys.stderr.write(f"[scale] {msg}\n")
    sys.stderr.flush()


def get_dataset():
    from tests.util.synth import (plant_variants, random_genome,
                                  simulate_reads_fast, write_dataset)
    key = hashlib.md5(
        f"scale-{MBP}-{N_CONTIGS}-{COVERAGE}-{READ_LEN}-{ERROR}"
        .encode()).hexdigest()[:10]
    cache = f"/tmp/pepper_scale_{key}"
    fasta, bam = cache + "/ref.fa", cache + "/reads.bam"
    if not (os.path.isfile(fasta) and os.path.isfile(bam)):
        os.makedirs(cache, exist_ok=True)
        t0 = time.time()
        per_mbp = int(MBP)
        genome = random_genome(int(MBP * 1e6 / N_CONTIGS), seed=21,
                               n_contigs=N_CONTIGS)
        variants = plant_variants(dict(genome), 800 * per_mbp,
                                  100 * per_mbp, 100 * per_mbp, seed=22)
        records = simulate_reads_fast(genome, variants, coverage=COVERAGE,
                                      read_length=READ_LEN,
                                      error_rate=ERROR, seed=23)
        write_dataset(cache, genome, records)
        log(f"dataset built in {time.time() - t0:.0f}s "
            f"({len(records)} reads, BAM "
            f"{os.path.getsize(bam) / 1e6:.0f} MB)")
    import jax  # noqa: F401  (model init below needs a backend)
    import numpy as np
    from pepper_tpu.models.checkpoint import save_checkpoint
    from pepper_tpu.models.variant_model import init_variant_params
    model = cache + "/model.npz"
    if not os.path.isfile(model):
        import jax as _jax
        params = init_variant_params(_jax.random.PRNGKey(0))
        save_checkpoint(model, _jax.tree_util.tree_map(np.asarray, params),
                        {})
    return cache, fasta, bam, model


_DRIVER = """
import json, sys
if {force_cpu!r}:
    import jax
    # NB: the tunnel plugin ignores the JAX_PLATFORMS env var; only the
    # config knob actually selects the CPU backend here
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from pepper_tpu.options import PipelineConfig
from pepper_tpu.presets import set_parameters
from pepper_tpu.pipelines.call_variant import call_variant
config = PipelineConfig(**json.load(open(sys.argv[1])))
call_variant(set_parameters(config))
"""


def run_pipeline(cache, fasta, bam, model, out_dir, crash_after=0,
                 force_cpu=False, region=None):
    """One call_variant subprocess; returns (rc, wall, peak_rss_mb,
    stderr_text). Peak RSS is sampled from /proc/<pid>/status (1 Hz) —
    rusage high-water marks persist across children and would blur runs
    together."""
    cfg = dict(bam=bam, fasta=fasta, output_dir=out_dir,
               sub_command="call_variant", ont_r9_guppy5_sup=True,
               threads=os.cpu_count() or 2, model_path=model,
               region=region)
    cfg_path = os.path.join(cache, "scale_config.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    env = dict(os.environ)
    if crash_after:
        env["PEPPER_TPU_TEST_CRASH_AFTER_FLUSH"] = str(crash_after)
    t0 = time.time()
    p = subprocess.Popen(
        [sys.executable, "-c",
         _DRIVER.format(repo=REPO, force_cpu=force_cpu), cfg_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    peak_kb = 0
    while p.poll() is None:
        try:
            with open(f"/proc/{p.pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS"):
                        peak_kb = max(peak_kb, int(line.split()[1]))
                        break
        except FileNotFoundError:
            break
        time.sleep(1.0)
        if time.time() - t0 > 3600:
            p.kill()
            raise TimeoutError("pipeline run exceeded 1h")
    _out, err = p.communicate()
    wall = time.time() - t0
    return p.returncode, wall, peak_kb / 1024.0, err.decode()


def vcf_bytes(out_dir):
    paths = sorted(glob.glob(os.path.join(out_dir, "*.vcf.gz")))
    assert len(paths) == 5, f"expected 5 VCFs in {out_dir}: {paths}"
    return {os.path.basename(p): open(p, "rb").read() for p in paths}


def main():
    cache, fasta, bam, model = get_dataset()
    result = {"mbp": MBP, "contigs": N_CONTIGS, "coverage": COVERAGE,
              "bam_mb": round(os.path.getsize(bam) / 1e6, 1)}

    # ---- uninterrupted run -------------------------------------------------
    ref_out = cache + "/ref_out/"
    rc, wall, rss, err = run_pipeline(cache, fasta, bam, model, ref_out)
    assert rc == 0, err[-4000:]
    # warm second run for the honest number (first pays compile + page cache)
    rc, wall, rss, err = run_pipeline(cache, fasta, bam, model, ref_out)
    assert rc == 0, err[-4000:]
    ref = vcf_bytes(ref_out)
    n_cand = int(re.search(r"STREAMED ENCODE\+INFERENCE: (\d+)", err).group(1))
    stream_s = float(re.search(
        r"STREAMED ENCODE\+INFERENCE: \d+ CANDIDATES \[([0-9.]+)s\]",
        err).group(1))
    breakdown = re.search(r"STREAM BREAKDOWN \(core-seconds\): (.+)", err)
    preds = sorted(
        glob.glob(ref_out + "predictions_*/pepper_predictions.hdf"),
        key=os.path.getmtime)
    # newest run only: repeated runs leave one run-stamped dir each
    store_mb = os.path.getsize(preds[-1]) / 1e6 if preds else 0.0
    result.update(
        e2e_wall_s=round(wall, 1),
        mbp_per_s=round(MBP / wall, 3),
        stream_s=round(stream_s, 1),
        watermark_tail_s=round(wall - stream_s, 1),  # incl. process spawn
        peak_rss_mb=round(rss, 0),
        candidates=n_cand,
        prediction_store_mb=round(store_mb, 1),
        stream_breakdown=breakdown.group(1) if breakdown else None)
    log(f"uninterrupted: {wall:.1f}s ({MBP / wall:.2f} Mbp/s), "
        f"peak RSS {rss:.0f} MB, store {store_mb:.0f} MB, "
        f"{n_cand} candidates")

    # The default-backend RSS above includes this machine's TPU-tunnel
    # plugin leaking every staged transfer buffer (see
    # runtime/placement.py). Measure the PIPELINE's own memory envelope
    # on a config-forced CPU backend, where the client is leak-free.
    # One contig (MBP/N_CONTIGS) is enough: the envelope is queue-bound
    # and plateaus early, while full-length CPU inference takes ~1 h.
    with open(fasta + ".fai") as fh:
        cpu_region = fh.readline().split()[0]
    rc, cwall, cpu_rss, err = run_pipeline(cache, fasta, bam, model,
                                           cache + "/cpu_rss_out/",
                                           force_cpu=True,
                                           region=cpu_region)
    assert rc == 0, err[-3000:]
    result.update(cpu_backend_mbp=round(MBP / N_CONTIGS, 1),
                  cpu_backend_wall_s=round(cwall, 1),
                  cpu_backend_peak_rss_mb=round(cpu_rss, 0),
                  rss_note=("default-backend RSS includes the TPU-tunnel "
                            "plugin's per-transfer host-buffer leak "
                            "(environment artifact, see "
                            "pepper_tpu/runtime/placement.py); the "
                            "cpu_backend number is the pipeline's own "
                            "bounded envelope"))
    log(f"cpu-backend run: {cwall:.1f}s, peak RSS "
        f"{cpu_rss:.0f} MB (pipeline's own envelope)")

    # ---- kill -9 at ~50%, then byte-identical resume ----------------------
    import math
    batch_floor = int(os.environ.get("PEPPER_TPU_MIN_DEVICE_BATCH", "16384"))
    crash_after = max(1, math.ceil(n_cand / batch_floor / 2))
    out = cache + "/crash_out/"
    rc, _, _, err = run_pipeline(cache, fasta, bam, model, out,
                                 crash_after=crash_after)
    assert rc == 9, (rc, err[-3000:])
    journal = glob.glob(out + "pepper_stream_*resume.journal")
    assert journal, "crashed run must leave its journal"
    journal_mb = os.path.getsize(journal[0]) / 1e6
    rc, rwall, rrss, err = run_pipeline(cache, fasta, bam, model, out)
    assert rc == 0, err[-4000:]
    m = re.search(r"RESUME: (\d+)/(\d+) INTERVALS", err)
    assert m, "resumed run must replay from the journal"
    assert vcf_bytes(out) == ref, \
        "resumed VCFs must be byte-identical to the uninterrupted run"
    result.update(
        crash_after_batches=crash_after,
        journal_mb_at_crash=round(journal_mb, 1),
        resume_replayed=f"{m.group(1)}/{m.group(2)}",
        resume_wall_s=round(rwall, 1),
        resume_peak_rss_mb=round(rrss, 0),
        resume_byte_identical=True)
    log(f"kill -9 at batch {crash_after} -> resume replayed "
        f"{m.group(1)}/{m.group(2)} intervals in {rwall:.1f}s, "
        f"journal was {journal_mb:.0f} MB, VCFs byte-identical")

    out_path = os.environ.get("PEPPER_SCALE_OUT",
                              os.path.join(REPO, "SCALE_r05.json"))
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
