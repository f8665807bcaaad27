#!/usr/bin/env python
"""Per-size int8 engine accuracy cell (VERDICT r3 #7): train ONE zoo
WIDERFACE model (XS/S/M/L) on the synthetic set, then evaluate the
trained weights through the fp32 AND fused-int8 deployment engines
(TRT-style real-crop calibration) and report the mAP_50 delta — the
accuracy leg that lets int8 latency rows be published without an
asterisk, mirroring how the reference only publishes int8 rows with
accuracy intact.

Prints one `QUALITY_RESULT {json}` line (campaign cell contract).

Usage: python tools/int8_quality_cell.py WIDERFACE-L [epochs]
"""
import json
import sys
import time


def main():
    model = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from synthetic_e2e import run_synthetic

    t0 = time.time()
    # threshold 0.2 gates only "did it learn at all": the cell's product
    # is the fp32-vs-int8 ENGINE DELTA, which is meaningful whenever the
    # fp32 engine detects; absolute synthetic mAP for a from-scratch zoo
    # model in 60 short epochs is not the claim
    m = run_synthetic(epochs=epochs, threshold=0.2, zoo_model=model,
                      engine_quality=True)
    q = m["engine_mAP_50"]
    delta = q["fp32"] - q["int8"]
    print("QUALITY_RESULT " + json.dumps(dict(
        model=model, epochs=epochs,
        mAP_50_predict=round(float(m.get("mAP_50", 0.0)), 4),
        mAP_50_fp32_engine=round(float(q["fp32"]), 4),
        mAP_50_int8_engine=round(float(q["int8"]), 4),
        int8_delta=round(float(delta), 4),
        total_s=round(time.time() - t0, 1),
    )))


if __name__ == "__main__":
    main()
