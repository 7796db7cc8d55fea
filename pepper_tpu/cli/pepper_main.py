"""`pepper` CLI — assembly polishing (flag parity with reference
pepper/pepper.py: polish, make_images, call_consensus, stitch,
download_models, backend_stat)."""
import argparse
import sys

from pepper_tpu.version import __version__


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="pepper", description="TPU-native nanopore assembly polishing.")
    parser.add_argument("--version", action="version",
                        version="pepper_tpu " + __version__)
    sub = parser.add_subparsers(dest="sub_command", required=True)

    po = sub.add_parser("polish", help="Run the full polishing pipeline.")
    po.add_argument("-b", "--bam", required=True,
                    help="Reads-to-draft alignment BAM.")
    po.add_argument("-f", "--fasta", required=True, help="Draft assembly FASTA.")
    po.add_argument("-m", "--model_path", required=True)
    po.add_argument("-o", "--output_dir", required=True)
    po.add_argument("-t", "--threads", type=int, default=1)
    po.add_argument("-r", "--region", default=None)
    po.add_argument("-bs", "--batch_size", type=int, default=128)
    po.add_argument("--no_realignment", action="store_true", default=False)
    po.add_argument("--no_streaming", dest="streaming", action="store_false",
                    default=True,
                    help="Disable the fused pileup+consensus stream; run "
                         "staged stage 1 then stage 2 with a file barrier.")
    po.add_argument("--no_resume", dest="resume", action="store_false",
                    default=True,
                    help="Disable the crash-safe resume journal (a killed "
                         "streamed run otherwise resumes from completed "
                         "intervals byte-identically).")
    po.add_argument("--keep_image_artifacts", action="store_true",
                    default=False,
                    help="In streaming mode, also write the stage-1 image "
                         "HDF (as an artifact, not a barrier).")

    mi = sub.add_parser("make_images", help="Stage 1: pileup images.")
    mi.add_argument("-b", "--bam", required=True)
    mi.add_argument("-f", "--fasta", required=True)
    mi.add_argument("-o", "--output_dir", required=True)
    mi.add_argument("-t", "--threads", type=int, default=1)
    mi.add_argument("-r", "--region", default=None)
    mi.add_argument("--no_realignment", action="store_true", default=False)

    cc = sub.add_parser("call_consensus", help="Stage 2: consensus inference.")
    cc.add_argument("-i", "--image_dir", required=True)
    cc.add_argument("-m", "--model_path", required=True)
    cc.add_argument("-o", "--output_dir", required=True)
    cc.add_argument("-bs", "--batch_size", type=int, default=128)
    cc.add_argument("-w", "--num_workers", type=int, default=0)

    st = sub.add_parser("stitch", help="Stage 3: stitch to polished FASTA.")
    st.add_argument("-i", "--input_dir", required=True,
                    help="Directory with prediction files.")
    st.add_argument("-o", "--output_dir", required=True)
    st.add_argument("-t", "--threads", type=int, default=1)
    st.add_argument("--stitcher", choices=("v1", "v2"), default="v1",
                    help="v1: positional de-dup (default); v2: overlap "
                         "alignment (StitchV2).")

    dm = sub.add_parser("download_models", help="Download trained models.")
    dm.add_argument("-o", "--output_dir", required=True)
    dm.add_argument("--manifest_url", default=None,
                    help="Override the model-manifest URL (supports file:// "
                         "for air-gapped mirrors).")

    sub.add_parser("backend_stat",
                   help="Print JAX backend/device configuration.")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.sub_command == "polish":
        from pepper_tpu.polish.pipeline import polish
        polish(args.bam, args.fasta, args.model_path, args.output_dir,
               region=args.region, threads=args.threads,
               batch_size=args.batch_size,
               realignment=not args.no_realignment,
               streaming=args.streaming,
               keep_image_artifacts=args.keep_image_artifacts,
               resume=args.resume)
    elif args.sub_command == "make_images":
        from pepper_tpu.polish.make_images import generate_polish_images
        generate_polish_images(args.bam, args.fasta, args.output_dir,
                               region=args.region, threads=args.threads,
                               realignment_flag=not args.no_realignment)
    elif args.sub_command == "call_consensus":
        from pepper_tpu.polish.consensus import call_consensus
        call_consensus(args.image_dir, args.model_path, args.output_dir,
                       batch_size=args.batch_size)
    elif args.sub_command == "stitch":
        from pepper_tpu.polish.stitch import perform_stitch
        perform_stitch(args.input_dir, args.output_dir.rstrip("/") + "/PEPPER",
                       args.threads, stitcher=args.stitcher)
    elif args.sub_command == "download_models":
        from pepper_tpu.utils.download_model import (MANIFEST_URL,
                                                     download_models)
        try:
            download_models(args.output_dir,
                            manifest_url=args.manifest_url or MANIFEST_URL)
        except OSError as exc:
            sys.stderr.write(
                f"ERROR: model download failed ({exc}). In air-gapped "
                "environments pass --manifest_url file://... pointing at a "
                "local mirror, or place checkpoints (.npz native or torch "
                ".pkl) in the model directory manually.\n")
            return 1
    elif args.sub_command == "backend_stat":
        import jax
        print(f"jax version: {jax.__version__}")
        print(f"devices: {jax.devices()}")
        print(f"default backend: {jax.default_backend()}")
        print(f"local device count: {jax.local_device_count()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
