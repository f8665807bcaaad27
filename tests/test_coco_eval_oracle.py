# Validate lfdtpu's vectorized numpy COCO evaluator against an
# INDEPENDENT line-faithful transcription of pycocotools' cocoeval.py
# (bbox iouType) on randomized fixtures (VERDICT r1 weak #4 / next #6).
# pycocotools itself cannot be installed here (zero egress), so the
# oracle below is transcribed 1:1 from its published algorithm —
# structured as computeIoU/evaluateImg/accumulate like the original,
# completely unlike lfdtpu's implementation.
import numpy as np

from lfdtpu.evaluation import coco_map

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [
    ("all", (0.0, 1e10)),
    ("small", (0.0, 32.0**2)),
    ("medium", (32.0**2, 96.0**2)),
    ("large", (96.0**2, 1e10)),
]


def _iou_bbox(d, g, iscrowd):
    """maskUtils.iou for bbox mode: xywh, crowd gt uses det-area union."""
    d = np.asarray(d, np.float64).reshape(-1, 4)
    g = np.asarray(g, np.float64).reshape(-1, 4)
    out = np.zeros((len(d), len(g)))
    for i, db in enumerate(d):
        for j, gb in enumerate(g):
            ix = min(db[0] + db[2], gb[0] + gb[2]) - max(db[0], gb[0])
            iy = min(db[1] + db[3], gb[1] + gb[3]) - max(db[1], gb[1])
            inter = max(ix, 0.0) * max(iy, 0.0)
            if iscrowd[j]:
                union = db[2] * db[3]
            else:
                union = db[2] * db[3] + gb[2] * gb[3] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


class PyCocoMirror:
    """Transcription of pycocotools.cocoeval.COCOeval (iouType='bbox')."""

    def __init__(self, gts, dts, maxDets=(100, 300, 1000)):
        # gts/dts: lists of dicts with image_id, category_id, bbox, score
        # (dts), iscrowd (gts); ids assigned 1-based like COCO.loadRes
        self.gts, self.dts = [], []
        for i, g in enumerate(gts):
            g = dict(g)
            g["id"] = i + 1
            g["area"] = g["bbox"][2] * g["bbox"][3]
            self.gts.append(g)
        for i, d in enumerate(dts):
            d = dict(d)
            d["id"] = i + 1
            d["area"] = d["bbox"][2] * d["bbox"][3]
            self.dts.append(d)
        self.imgIds = sorted(
            {g["image_id"] for g in self.gts} | {d["image_id"] for d in self.dts}
        )
        self.catIds = sorted(
            {g["category_id"] for g in self.gts} | {d["category_id"] for d in self.dts}
        )
        self.maxDets = list(maxDets)

    def _gt(self, imgId, catId):
        return [g for g in self.gts if g["image_id"] == imgId and g["category_id"] == catId]

    def _dt(self, imgId, catId):
        return [d for d in self.dts if d["image_id"] == imgId and d["category_id"] == catId]

    def computeIoU(self, imgId, catId):
        gt, dt = self._gt(imgId, catId), self._dt(imgId, catId)
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > self.maxDets[-1]:
            dt = dt[0 : self.maxDets[-1]]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        return _iou_bbox([d["bbox"] for d in dt], [g["bbox"] for g in gt], iscrowd)

    def evaluateImg(self, imgId, catId, aRng, maxDet):
        gt, dt = self._gt(imgId, catId), self._dt(imgId, catId)
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g["iscrowd"] or g["area"] < aRng[0] or g["area"] > aRng[1]:
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o["iscrowd"]) for o in gt]
        ious = self.computeIoU(imgId, catId)
        ious = (
            ious[:, gtind] if len(ious) > 0 else ious
        )
        T = len(IOU_THRS)
        G, D = len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious):
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array(
            [d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]
        ).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def accumulate(self):
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.catIds), len(AREA_RNGS), len(self.maxDets)
        precision = -np.ones((T, R, K, A, M))
        for k, catId in enumerate(self.catIds):
            for a, (_, aRng) in enumerate(AREA_RNGS):
                E_full = [
                    self.evaluateImg(imgId, catId, aRng, self.maxDets[-1])
                    for imgId in self.imgIds
                ]
                for m, maxDet in enumerate(self.maxDets):
                    E = [e for e in E_full if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [np.asarray(e["dtScores"])[0:maxDet] for e in E]
                    )
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E], axis=1
                    )[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E], axis=1
                    )[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dtIg)
                    )
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        sinds = np.searchsorted(rc, REC_THRS, side="left")
                        try:
                            for ri, pi in enumerate(sinds):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        self.precision = precision

    def summarize(self):
        def _summ(iouThr=None, areaRng="all", maxDets=100):
            aind = [i for i, (n, _) in enumerate(AREA_RNGS) if n == areaRng]
            mind = [i for i, m in enumerate(self.maxDets) if m == maxDets]
            s = self.precision
            if iouThr is not None:
                t = np.where(np.abs(IOU_THRS - iouThr) < 1e-9)[0]
                s = s[t]
            s = s[:, :, :, aind, mind]
            return -1.0 if len(s[s > -1]) == 0 else float(np.mean(s[s > -1]))

        last = self.maxDets[-1]
        return {
            "mAP": _summ(),
            "mAP_50": _summ(iouThr=0.5, maxDets=last),
            "mAP_75": _summ(iouThr=0.75, maxDets=last),
            "mAP_s": _summ(areaRng="small", maxDets=last),
            "mAP_m": _summ(areaRng="medium", maxDets=last),
            "mAP_l": _summ(areaRng="large", maxDets=last),
        }


def _random_fixture(seed, n_images=30, n_cats=4, heavy_image=True):
    """GTs + detections with crowds, score ties, all three area classes,
    dets on gt-less images, and one image-cat with >100 dets (so the
    maxDets=100 vs 1000 columns genuinely differ)."""
    rng = np.random.RandomState(seed)
    gts, dts = [], []
    for img in range(n_images):
        for cat in range(1, n_cats + 1):
            for _ in range(rng.randint(0, 4)):
                size_class = rng.randint(3)
                wh = [
                    rng.uniform(4, 30) if size_class == 0
                    else rng.uniform(40, 90) if size_class == 1
                    else rng.uniform(100, 300)
                    for _ in range(2)
                ]
                box = [rng.uniform(0, 500), rng.uniform(0, 500), wh[0], wh[1]]
                gts.append(
                    dict(image_id=img, category_id=cat, bbox=box,
                         iscrowd=int(rng.rand() < 0.15))
                )
    rng2 = np.random.RandomState(seed + 1)
    for g in gts:
        if rng2.rand() < 0.8:
            b = g["bbox"]
            jitter = rng2.uniform(-0.2, 0.2, 4)
            box = [
                b[0] + jitter[0] * b[2], b[1] + jitter[1] * b[3],
                max(b[2] * (1 + jitter[2]), 2), max(b[3] * (1 + jitter[3]), 2),
            ]
            dts.append(
                dict(image_id=g["image_id"], category_id=g["category_id"],
                     bbox=box, score=round(float(rng2.rand()), 1))  # ties!
            )
    for _ in range(n_images * 2):  # noise dets, some on gt-less images
        dts.append(
            dict(image_id=int(rng2.randint(0, n_images + 5)),
                 category_id=int(rng2.randint(1, n_cats + 1)),
                 bbox=[rng2.uniform(0, 500), rng2.uniform(0, 500),
                       rng2.uniform(5, 200), rng2.uniform(5, 200)],
                 score=round(float(rng2.rand()), 1))
        )
    if heavy_image:  # >100 dets on one (img, cat): maxDets truncation
        for _ in range(120):
            dts.append(
                dict(image_id=0, category_id=1,
                     bbox=[rng2.uniform(0, 500), rng2.uniform(0, 500),
                           rng2.uniform(5, 120), rng2.uniform(5, 120)],
                     score=float(rng2.rand()))
            )
    return gts, dts


def _to_lfdtpu_format(gts, dts, n_cats):
    gt_by, det_by = {}, {}
    for g in gts:
        boxes, crowd = gt_by.setdefault(
            (g["image_id"], g["category_id"]), ([], [])
        )
        boxes.append(list(g["bbox"]))
        crowd.append(bool(g["iscrowd"]))
    for d in dts:
        boxes, scores = det_by.setdefault(
            (d["image_id"], d["category_id"]), ([], [])
        )
        boxes.append(list(d["bbox"]))
        scores.append(float(d["score"]))
    return gt_by, det_by, list(range(1, n_cats + 1))


def _compare(seed, **fixture_kw):
    gts, dts = _random_fixture(seed, **fixture_kw)
    mirror = PyCocoMirror(gts, dts)
    mirror.accumulate()
    want = mirror.summarize()
    gt_by, det_by, cats = _to_lfdtpu_format(gts, dts, 4)
    got = coco_map(gt_by, det_by, cats)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-9, err_msg=f"{k} seed={seed}")
    return want


def test_coco_map_matches_pycocotools_transcription():
    for seed in (0, 1, 2):
        want = _compare(seed)
    # sanity: the fixture exercises real signal, not all -1/0
    assert 0.0 < want["mAP"] < 1.0


def test_coco_map_maxdets_column_differs():
    """The heavy image makes mAP (maxDets=100) differ from a hypothetical
    1000-cap run — guards the per-image truncation semantics."""
    gts, dts = _random_fixture(7)
    gt_by, det_by, cats = _to_lfdtpu_format(gts, dts, 4)
    a = coco_map(gt_by, det_by, cats, max_dets=(100, 300, 1000))
    b = coco_map(gt_by, det_by, cats, max_dets=(1000,))
    assert a["mAP"] != b["mAP"]


def test_coco_map_no_dets_for_category():
    gts, dts = _random_fixture(3, n_images=8)
    dts = [d for d in dts if d["category_id"] != 2]
    mirror = PyCocoMirror(gts, dts)
    mirror.accumulate()
    want = mirror.summarize()
    gt_by, det_by, cats = _to_lfdtpu_format(gts, dts, 4)
    got = coco_map(gt_by, det_by, cats)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-9, err_msg=k)
