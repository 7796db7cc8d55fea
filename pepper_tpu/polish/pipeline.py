"""End-to-end `polish` driver (reference pepper/modules/python/polish.py):
make_images -> call_consensus -> perform_stitch."""
import os
import sys
import time
from datetime import datetime
from typing import Optional

from pepper_tpu.polish.consensus import call_consensus
from pepper_tpu.polish.make_images import generate_polish_images
from pepper_tpu.polish.stitch import perform_stitch


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def polish(bam: str, fasta: str, model_path: str, output_dir: str,
           region: Optional[str] = None, threads: int = 1,
           batch_size: int = 128, realignment: bool = True,
           streaming: bool = True,
           keep_image_artifacts: bool = False,
           resume: bool = True) -> str:
    start_time = time.time()
    if not output_dir.endswith("/"):
        output_dir += "/"
    os.makedirs(output_dir, exist_ok=True)
    timestr = time.strftime("%m%d%Y_%H%M%S")
    image_dir = output_dir + f"images_{timestr}/"
    prediction_dir = output_dir + f"predictions_{timestr}/"

    if streaming:
        # fused stage 1+2+3 (polish/streaming.py + stitch.StreamingStitcher):
        # pileup encode streams into consensus inference with no file
        # barrier, and completed contigs are stitched behind the device at
        # the contig watermark — no post-hoc store-read stitch pass. Image
        # HDF5s are optional artifacts; the prediction store is still
        # written (stage re-runnability).
        from pepper_tpu.polish.make_images import build_polish_intervals
        from pepper_tpu.polish.stitch import StreamingStitcher
        from pepper_tpu.polish.streaming import stream_polish
        _log("STEP 1+2+3/3 STREAMING PILEUPS INTO CONSENSUS AND STITCH")
        os.makedirs(prediction_dir, exist_ok=True)
        image_store_path = None
        if keep_image_artifacts:
            os.makedirs(image_dir, exist_ok=True)
            image_store_path = image_dir + "pepper_polish_images_streamed.hdf"
        intervals = build_polish_intervals(fasta, bam, region)
        stitcher = StreamingStitcher(
            intervals, output_dir + "PEPPER_pepper_polished.fa")
        # crash-safe per-interval resume journal: lives in the STABLE
        # output dir (the prediction dir is run-stamped); deleted only
        # after the polished FASTA is fully written
        journal_path = (output_dir + "pepper_polish_resume.journal"
                        if resume else None)
        try:
            stream_polish(bam, fasta, model_path,
                          prediction_dir + "pepper_prediction_0.hdf",
                          image_store_path, region=region, threads=threads,
                          batch_size=batch_size,
                          realignment_flag=realignment, stitcher=stitcher,
                          resume_journal=journal_path)
            out = stitcher.finish()
            if journal_path and os.path.exists(journal_path):
                os.remove(journal_path)   # run complete: nothing to resume
        except BaseException:
            stitcher.abort()   # no truncated-but-plausible FASTA artifacts
            raise
    else:
        _log("STEP 1/3 GENERATING IMAGES")
        generate_polish_images(bam, fasta, image_dir, region=region,
                               threads=threads, realignment_flag=realignment)
        _log("STEP 2/3 RUNNING CONSENSUS INFERENCE")
        call_consensus(image_dir, model_path, prediction_dir,
                       batch_size=batch_size)
        _log("STEP 3/3 STITCHING")
        out = perform_stitch(prediction_dir, output_dir + "PEPPER", threads)
    elapsed = time.time() - start_time
    _log(f"TOTAL ELAPSED TIME: {int(elapsed // 60)} Min {int(elapsed % 60)} Sec")
    return out
