"""Weights-staging CLI (reference: src/openparse/cli.py:43-48).

Materializes the engine's deterministic model assets (OCR typeface,
MinHash permutation params, LSH hyperplanes) into a weights directory,
skipping files already present — the hermetic analog of the reference's
unitable checkpoint downloader. Optionally broadcasts them into a Ray
object store session to verify the cluster staging path.

Usage:
    python tools/stage_weights.py [--dest DIR] [--broadcast]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description="Stage open_parse_ray weights.")
    parser.add_argument(
        "--dest",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "open_parse_ray",
            "weights",
        ),
        help="weights directory (default: package-local, like the reference)",
    )
    parser.add_argument(
        "--broadcast",
        action="store_true",
        help="also ray.put the staged weights (owns a local Ray session)",
    )
    args = parser.parse_args()

    from open_parse_ray.state.weights import stage_to_object_store, stage_weights

    paths = stage_weights(args.dest)
    if args.broadcast:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        refs = stage_to_object_store(args.dest)
        print(f"Broadcast {len(refs)} weight sets to the object store.")
        ray.shutdown()
    print(f"All weights staged! ({len(paths)} files)")


if __name__ == "__main__":
    main()
