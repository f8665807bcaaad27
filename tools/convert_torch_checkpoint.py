#!/usr/bin/env python
"""Convert a reference (LFD-A-Light-and-Fast-Detector) torch checkpoint
into an lfdtpu checkpoint.

    python tools/convert_torch_checkpoint.py epoch_1000.pth out.pkl \
        --model widerface:S

The output loads with `lfdtpu.execution.load_checkpoint` and drops into
every predict / evaluation / engine-build flow (see MIGRATION.md).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_model(spec):
    from lfdtpu import zoo

    family, _, size = spec.partition(":")
    builders = dict(
        widerface=zoo.widerface_lfd,
        tt100k=zoo.tt100k_lfd,
        trafficlight=zoo.trafficlight_lfd,
    )
    if family not in builders:
        raise SystemExit(f"unknown model family {family!r}; pick from {sorted(builders)}")
    return builders[family](size or "L")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pth", help="reference .pth checkpoint")
    ap.add_argument("out", help="output lfdtpu checkpoint path")
    ap.add_argument("--model", required=True,
                    help="family:size, e.g. widerface:S, tt100k:L, trafficlight:S")
    args = ap.parse_args()

    import jax

    from lfdtpu.execution import save_checkpoint
    from lfdtpu.execution.torch_convert import load_reference_checkpoint

    det = build_model(args.model)
    variables = det.init(jax.random.PRNGKey(0), (128, 128))
    converted = load_reference_checkpoint(args.pth, det, variables)
    save_checkpoint(args.out, converted, meta=dict(source=os.path.abspath(args.pth),
                                                   model=args.model))
    n = sum(np.prod(np.shape(x)) for x in jax.tree.leaves(converted["params"]))
    print(f"wrote {args.out} ({int(n):,} params)")


if __name__ == "__main__":
    import numpy as np

    main()
