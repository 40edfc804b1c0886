"""Offline weight conversion: ultralytics YOLOv8 checkpoint -> flax npz.

Parity: the reference converts public checkpoints offline into its
inference format (scripts/generate_engine.sh:34-101: ultralytics .pt ->
ONNX -> trtexec .engine). Here the target format is this package's flax
param tree saved as .npz (models/yolo.save_weights layout), consumed by
models/detect.make_detector(weights_path=...).

Input: a torch state_dict in ultralytics DetectionModel naming
("model.0.conv.weight", ...). Obtain one offline with:

    from ultralytics import YOLO
    import torch
    torch.save(YOLO("yolov8s.pt").model.state_dict(), "yolov8s_sd.pt")

then convert on any machine with torch (no ultralytics needed):

    python -m aria_slam_tpu.models.convert_weights yolov8s_sd.pt \
        yolov8s.npz --width 0.5 --depth 0.33 --classes 80

Layout translation: torch conv (out, in, kh, kw) -> flax (kh, kw, in,
out); BN weight/bias/running_mean/running_var -> scale/bias/mean/var.
The architecture in models/yolo.py mirrors ultralytics v8 layer-for-
layer (explicit k//2 padding, BN eps 1e-3, Detect branch widths from
the first level) so the mapping is purely structural. The fixed-weight
DFL conv (model.22.dfl) is skipped — decode_predictions computes the
same softmax expectation directly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from aria_slam_tpu.config import DetectorConfig


def _n(d: int, mult: float) -> int:
    return max(1, int(round(d * mult)))


def _conv(u: str, f: Tuple[str, ...]) -> List[tuple]:
    """Entries for one ultralytics Conv (conv + bn) mapped to ConvBnAct."""
    return [
        (f"{u}.conv.weight", ("params",) + f + ("Conv_0", "kernel"), "conv"),
        (f"{u}.bn.weight", ("params",) + f + ("BatchNorm_0", "scale"), "raw"),
        (f"{u}.bn.bias", ("params",) + f + ("BatchNorm_0", "bias"), "raw"),
        (f"{u}.bn.running_mean", ("batch_stats",) + f + ("BatchNorm_0", "mean"), "raw"),
        (f"{u}.bn.running_var", ("batch_stats",) + f + ("BatchNorm_0", "var"), "raw"),
    ]


def _c2f(u: str, f: Tuple[str, ...], n: int) -> List[tuple]:
    out = _conv(f"{u}.cv1", f + ("ConvBnAct_0",))
    for i in range(n):
        out += _conv(f"{u}.m.{i}.cv1", f + (f"Bottleneck_{i}", "ConvBnAct_0"))
        out += _conv(f"{u}.m.{i}.cv2", f + (f"Bottleneck_{i}", "ConvBnAct_1"))
    out += _conv(f"{u}.cv2", f + ("ConvBnAct_1",))
    return out


def build_mapping(depth_mult: float) -> List[tuple]:
    """Ordered (ultralytics key, flax path, transform) triples for the
    full v8 detection model. Structure is fixed; only C2f repeat counts
    depend on the depth multiplier."""
    bb = ("YoloBackboneNeck_0",)
    n3 = _n(3, depth_mult)
    n6 = _n(6, depth_mult)
    m: List[tuple] = []
    m += _conv("model.0", bb + ("ConvBnAct_0",))                 # stem /2
    m += _conv("model.1", bb + ("ConvBnAct_1",))                 # /4
    m += _c2f("model.2", bb + ("C2f_0",), n3)
    m += _conv("model.3", bb + ("ConvBnAct_2",))                 # /8
    m += _c2f("model.4", bb + ("C2f_1",), n6)
    m += _conv("model.5", bb + ("ConvBnAct_3",))                 # /16
    m += _c2f("model.6", bb + ("C2f_2",), n6)
    m += _conv("model.7", bb + ("ConvBnAct_4",))                 # /32
    m += _c2f("model.8", bb + ("C2f_3",), n3)
    m += _conv("model.9.cv1", bb + ("SPPF_0", "ConvBnAct_0"))
    m += _conv("model.9.cv2", bb + ("SPPF_0", "ConvBnAct_1"))
    # PAN neck (layers 10/13 are upsample, 11/14/17/20 are concat)
    m += _c2f("model.12", bb + ("C2f_4",), n3)                   # n4
    m += _c2f("model.15", bb + ("C2f_5",), n3)                   # n3
    m += _conv("model.16", bb + ("ConvBnAct_5",))                # d4
    m += _c2f("model.18", bb + ("C2f_6",), n3)                   # m4
    m += _conv("model.19", bb + ("ConvBnAct_6",))                # d5
    m += _c2f("model.21", bb + ("C2f_7",), n3)                   # m5
    # Detect head: cv2 = box branch, cv3 = cls branch, per level l
    hd = ("DetectHead_0",)
    for lvl in range(3):
        m += _conv(f"model.22.cv2.{lvl}.0", hd + (f"ConvBnAct_{4 * lvl}",))
        m += _conv(f"model.22.cv2.{lvl}.1", hd + (f"ConvBnAct_{4 * lvl + 1}",))
        m += [
            (f"model.22.cv2.{lvl}.2.weight",
             ("params",) + hd + (f"Conv_{2 * lvl}", "kernel"), "conv"),
            (f"model.22.cv2.{lvl}.2.bias",
             ("params",) + hd + (f"Conv_{2 * lvl}", "bias"), "raw"),
        ]
        m += _conv(f"model.22.cv3.{lvl}.0", hd + (f"ConvBnAct_{4 * lvl + 2}",))
        m += _conv(f"model.22.cv3.{lvl}.1", hd + (f"ConvBnAct_{4 * lvl + 3}",))
        m += [
            (f"model.22.cv3.{lvl}.2.weight",
             ("params",) + hd + (f"Conv_{2 * lvl + 1}", "kernel"), "conv"),
            (f"model.22.cv3.{lvl}.2.bias",
             ("params",) + hd + (f"Conv_{2 * lvl + 1}", "bias"), "raw"),
        ]
    return m


# keys legitimately absent from the flax tree
_SKIP_PREFIXES = ("model.22.dfl",)
_SKIP_SUFFIXES = ("num_batches_tracked",)


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: DetectorConfig) -> dict:
    """ultralytics state_dict (numpy or torch tensors) -> flax variables
    {"params": ..., "batch_stats": ...}. Raises on missing keys, shape
    mismatches, or unconsumed checkpoint weights."""
    import flax.traverse_util as tu
    import jax.numpy as jnp

    from aria_slam_tpu.models import yolo

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k: v for k, v in sd.items()}
    _, ref = yolo.init_params(cfg)
    ref_flat = tu.flatten_dict(ref)

    out = {}
    consumed = set()
    for ukey, fpath, tf in build_mapping(cfg.depth_mult):
        if ukey not in sd:
            raise KeyError(f"checkpoint missing {ukey} (for {'/'.join(fpath)})")
        v = to_np(sd[ukey]).astype(np.float32)
        if tf == "conv":
            v = v.transpose(2, 3, 1, 0)  # (out,in,kh,kw) -> (kh,kw,in,out)
        if fpath not in ref_flat:
            raise KeyError(f"flax tree missing {'/'.join(fpath)}")
        want = ref_flat[fpath].shape
        if tuple(v.shape) != tuple(want):
            raise ValueError(
                f"shape mismatch at {ukey} -> {'/'.join(fpath)}: "
                f"checkpoint {v.shape} vs model {want} — wrong width/depth/"
                f"classes for this checkpoint?"
            )
        out[fpath] = jnp.asarray(v)
        consumed.add(ukey)

    leftovers = [
        k for k in sd
        if k not in consumed
        and not k.startswith(_SKIP_PREFIXES)
        and not k.endswith(_SKIP_SUFFIXES)
    ]
    if leftovers:
        raise ValueError(f"unconsumed checkpoint keys: {leftovers[:8]}"
                         f"{'...' if len(leftovers) > 8 else ''}")
    missing = [p for p in ref_flat if p not in out]
    if missing:
        raise ValueError(f"flax params not covered: "
                         f"{['/'.join(p) for p in missing[:8]]}")
    return tu.unflatten_dict(out)


def convert_file(pt_path: str, out_npz: str, cfg: DetectorConfig) -> None:
    import torch

    from aria_slam_tpu.models import yolo

    obj = torch.load(pt_path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        sd = obj["model"].state_dict()  # full ultralytics checkpoint
    elif isinstance(obj, dict):
        sd = obj  # raw state_dict
    else:
        sd = obj.state_dict()
    variables = convert_state_dict(sd, cfg)
    yolo.save_weights(variables, out_npz)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("pt_path", help=".pt state_dict (ultralytics naming)")
    ap.add_argument("out_npz", help="output .npz for detect.make_detector")
    ap.add_argument("--width", type=float, default=0.5, help="s=0.5 n=0.25")
    ap.add_argument("--depth", type=float, default=0.33)
    ap.add_argument("--classes", type=int, default=80)
    args = ap.parse_args()
    cfg = DetectorConfig(width_mult=args.width, depth_mult=args.depth,
                         num_classes=args.classes)
    convert_file(args.pt_path, args.out_npz, cfg)
    print(f"wrote {args.out_npz}")


if __name__ == "__main__":
    main()
