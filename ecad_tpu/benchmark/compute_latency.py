"""compute_latency — wall-clock per-image latency written into schedule
JSONs.

Parity with ecad/benchmark/compute_latency.py: warmup + timed sample
batches through the full pipeline; result recorded as metrics.latency
{avg, batch_size, num_samples, warmup_steps, gpu, warmups, latencies}
(:52-85). Uses the schedule-specialized unrolled program (the
latency-faithful variant — cached components are absent from the compiled
graph).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..image_generators import get_image_generator_type


def time_for_schedule(gen_type, schedule_path: Path, args) -> dict:
    gen = gen_type(
        schedule_path=schedule_path,
        weights_root=args.weights_root,
        random_weights=args.random_weights or args.weights_root is None,
        batch_size=args.batch_size,
    )
    if getattr(args, "random_vae", False):
        gen.use_random_vae = True
    latency = gen.time_image_generation(
        args.input_embeddings,
        warmup_steps=args.warmup_steps,
        num_samples=args.num_samples,
        batch_size=args.batch_size,
    )
    with schedule_path.open() as f:
        data = json.load(f)
    data.setdefault("metrics", {})["latency"] = latency
    with schedule_path.open("w") as f:
        json.dump(data, f, indent=4)
    print(f"{schedule_path.name}: {latency['avg']:.2f} ms/image")
    return latency


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image_generator")
    p.add_argument("--input-embeddings", type=Path, required=True)
    target = p.add_mutually_exclusive_group(required=True)
    target.add_argument("--schedule", type=Path)
    target.add_argument("--input-dir", type=Path)
    p.add_argument("--warmup-steps", type=int, default=10)
    p.add_argument("--num-samples", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--weights-root", type=Path, default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--random-vae", action="store_true",
                   help="decode through a random-weight VAE so the timed "
                        "region carries the real decode cost without "
                        "checkpoints (the reference's timed __call__ "
                        "includes the VAE)")
    p.add_argument("--profile-dir", type=Path, default=None,
                   help="write a jax.profiler trace of the timed runs "
                        "(viewable in TensorBoard/Perfetto)")
    args = p.parse_args(argv)

    gen_type = get_image_generator_type(args.image_generator)
    files = (
        [args.schedule]
        if args.schedule is not None
        else sorted(args.input_dir.rglob("*.json"))
    )
    if args.profile_dir is not None:
        import jax

        with jax.profiler.trace(str(args.profile_dir)):
            for f in files:
                time_for_schedule(gen_type, f, args)
        print(f"Profiler trace written to {args.profile_dir}")
        return
    for f in files:
        time_for_schedule(gen_type, f, args)


if __name__ == "__main__":
    main()
