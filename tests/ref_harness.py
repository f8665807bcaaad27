# Import the LIVE reference framework (/root/reference, torch CPU) for
# end-to-end oracle tests. The reference's native extensions (CUDA NMS,
# CUDA focal loss) are not built in this environment, so this installs
# faithful CPU stubs BEFORE importing `lfd`:
#
#   - nms_ext.nms        mirrors `nms/src/cpu/nms_cpu.cpp:7-74` exactly
#                        (exclusive-area IoU, suppress on iou > thr,
#                        descending score order) — validated against the
#                        doctest vectors in `lfd/model/utils/nms.py:24-34`.
#   - sigmoid_focal_loss_ext mirrors `sigmoid_focal_loss_cuda.cu:24-97`
#                        elementwise (stable log-sigmoid form).
#   - pycuda, lfd.data_pipeline (Sample only; the real package pulls
#     albumentations/pycocotools which are absent here).
#
# `.cuda()` is monkeypatched to a no-op so the reference's predict path
# (`lfd/model/lfd.py:544-655`) runs on CPU unchanged.
import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"


def _make_nms_ext(torch):
    mod = types.ModuleType("nms_ext")

    def nms(dets, iou_thr):
        d = dets.detach().cpu().numpy().astype(np.float64)
        if d.shape[0] == 0:
            return torch.zeros((0,), dtype=torch.long)
        x1, y1, x2, y2, sc = d[:, 0], d[:, 1], d[:, 2], d[:, 3], d[:, 4]
        areas = (x2 - x1) * (y2 - y1)
        order = np.argsort(-sc, kind="stable")
        suppressed = np.zeros(len(d), bool)
        keep = []
        for _i in range(len(order)):
            i = order[_i]
            if suppressed[i]:
                continue
            keep.append(i)
            xx1 = np.maximum(x1[i], x1[order[_i + 1:]])
            yy1 = np.maximum(y1[i], y1[order[_i + 1:]])
            xx2 = np.minimum(x2[i], x2[order[_i + 1:]])
            yy2 = np.minimum(y2[i], y2[order[_i + 1:]])
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            ovr = inter / (areas[i] + areas[order[_i + 1:]] - inter)
            suppressed[order[_i + 1:][ovr > iou_thr]] = True
        return torch.as_tensor(np.asarray(keep), dtype=torch.long)

    mod.nms = nms
    return mod


def _make_focal_ext(torch):
    mod = types.ModuleType("sigmoid_focal_loss_ext")
    FLT_MIN = 1.1754943508222875e-38

    def _terms(logits, gamma):
        p = torch.sigmoid(logits)
        pos = (logits >= 0).to(logits.dtype)
        # stable log(1-p) = -x*(x>=0) - log(1+exp(x-2x*(x>=0)))
        log1mp = -logits * pos - torch.log1p(torch.exp(logits - 2.0 * logits * pos))
        logp = torch.log(torch.clamp(p, min=FLT_MIN))
        return p, logp, log1mp

    def forward(input, target, num_classes, gamma, alpha):
        t = target.view(-1, 1)
        d = torch.arange(num_classes, device=input.device).view(1, -1)
        c1 = (t == d).to(input.dtype)
        c2 = ((t >= 0) & (t != d)).to(input.dtype)
        p, logp, log1mp = _terms(input, gamma)
        term1 = (1.0 - p).pow(gamma) * logp
        term2 = p.pow(gamma) * log1mp
        return -c1 * term1 * alpha - c2 * term2 * (1.0 - alpha)

    def backward(input, target, d_loss, num_classes, gamma, alpha):
        t = target.view(-1, 1)
        d = torch.arange(num_classes, device=input.device).view(1, -1)
        c1 = (t == d).to(input.dtype)
        c2 = ((t >= 0) & (t != d)).to(input.dtype)
        p, logp, log1mp = _terms(input, gamma)
        term1 = (1.0 - p).pow(gamma) * (1.0 - p - p * gamma * logp)
        term2 = p.pow(gamma) * (log1mp * (1.0 - p) * gamma - p)
        return (-c1 * term1 * alpha - c2 * term2 * (1.0 - alpha)) * d_loss

    mod.forward = forward
    mod.backward = backward
    return mod


def load_reference():
    """Import the live reference `lfd` package with CPU stubs; returns it."""
    if "lfd" in sys.modules and hasattr(sys.modules["lfd"], "model"):
        return sys.modules["lfd"]
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)

    pyc = types.ModuleType("pycuda")
    drv = types.ModuleType("pycuda.driver")
    pyc.driver = drv
    sys.modules.setdefault("pycuda", pyc)
    sys.modules.setdefault("pycuda.driver", drv)

    import lfd  # empty __init__

    # minimal data_pipeline: the real one imports albumentations/pycocotools
    dp = types.ModuleType("lfd.data_pipeline")
    ds = types.ModuleType("lfd.data_pipeline.dataset")
    spec = importlib.util.spec_from_file_location(
        "lfd.data_pipeline.dataset.sample",
        REF + "/lfd/data_pipeline/dataset/sample.py",
    )
    smod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(smod)
    ds.Sample = smod.Sample
    ds.reserved_keys = smod.reserved_keys
    dp.dataset = ds
    sys.modules["lfd.data_pipeline"] = dp
    sys.modules["lfd.data_pipeline.dataset"] = ds
    lfd.data_pipeline = dp

    libs_u = types.ModuleType("lfd.model.utils.libs")
    libs_u.nms_ext = _make_nms_ext(torch)
    sys.modules["lfd.model.utils.libs"] = libs_u
    libs_l = types.ModuleType("lfd.model.losses.libs")
    libs_l.sigmoid_focal_loss_ext = _make_focal_ext(torch)
    sys.modules["lfd.model.losses.libs"] = libs_l

    # CPU-only: .cuda() no-ops
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    import lfd.model  # noqa: F401  (triggers fcos/lfd/lfdv2 with stubs)

    return lfd


def simple_normalize_pipeline(sample):
    """The exact math of the reference's `simple_normalize` albumentations
    transform ((x - 0.5*255) / (0.5*255), `augmentation_pipeline.py:31-36`)
    as a plain function — albumentations itself is absent here. Passed to
    BOTH frameworks' predict so preprocessing is identical."""
    img = np.asarray(sample["image"], np.float32)
    sample["image"] = (img - 127.5) / 127.5
    return sample
