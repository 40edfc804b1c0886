"""Weight-converter validation: a minimal torch YOLOv8 (ultralytics
module naming, as produced by DetectionModel.state_dict()) is built in
this test, its state_dict converted with models/convert_weights, and the
flax model must reproduce the torch outputs numerically — validating
layer wiring, concat orders, padding conventions, BN eps, and the
(out,in,kh,kw)->(kh,kw,in,out) transpose all at once.

Parity: reference scripts/generate_engine.sh (ultralytics -> engine
conversion path)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

import jax.numpy as jnp  # noqa: E402

from aria_slam_tpu.config import DetectorConfig  # noqa: E402
from aria_slam_tpu.models import convert_weights, yolo  # noqa: E402

W, D, NC = 0.25, 0.33, 80
CFG = DetectorConfig(input_size=64, width_mult=W, depth_mult=D, num_classes=NC)


# ---------------------------------------------------------------- torch mirror
class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = TConv(c1, c1 // 2, 1)
        self.cv2 = TConv(c1 * 2, c2, 1)
        self.mp = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.mp(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TDetect(tnn.Module):
    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, 4 * reg_max)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for c in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1)) for c in ch)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f)) for i, f in enumerate(feats)]


class TModel(tnn.Module):
    def __init__(self, w=W, d=D, nc=NC):
        super().__init__()

        def ch(c):
            return max(16, int(round(c * w / 8)) * 8)

        def n(x):
            return max(1, int(round(x * d)))

        up = lambda: tnn.Upsample(scale_factor=2, mode="nearest")  # noqa: E731
        self.model = tnn.ModuleList([
            TConv(3, ch(64), 3, 2),                             # 0
            TConv(ch(64), ch(128), 3, 2),                       # 1
            TC2f(ch(128), ch(128), n(3)),                       # 2
            TConv(ch(128), ch(256), 3, 2),                      # 3
            TC2f(ch(256), ch(256), n(6)),                       # 4
            TConv(ch(256), ch(512), 3, 2),                      # 5
            TC2f(ch(512), ch(512), n(6)),                       # 6
            TConv(ch(512), ch(1024), 3, 2),                     # 7
            TC2f(ch(1024), ch(1024), n(3)),                     # 8
            TSPPF(ch(1024), ch(1024)),                          # 9
            up(), tnn.Identity(),                               # 10, 11
            TC2f(ch(1024) + ch(512), ch(512), n(3), False),     # 12
            up(), tnn.Identity(),                               # 13, 14
            TC2f(ch(512) + ch(256), ch(256), n(3), False),      # 15
            TConv(ch(256), ch(256), 3, 2),                      # 16
            tnn.Identity(),                                     # 17
            TC2f(ch(256) + ch(512), ch(512), n(3), False),      # 18
            TConv(ch(512), ch(512), 3, 2),                      # 19
            tnn.Identity(),                                     # 20
            TC2f(ch(512) + ch(1024), ch(1024), n(3), False),    # 21
            TDetect(nc, [ch(256), ch(512), ch(1024)]),          # 22
        ])

    def forward(self, x):
        m = self.model
        x = m[3](m[2](m[1](m[0](x))))
        p3 = m[4](x)
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        n4 = m[12](torch.cat([m[10](p5), p4], 1))
        n3 = m[15](torch.cat([m[13](n4), p3], 1))
        m4 = m[18](torch.cat([m[16](n3), n4], 1))
        m5 = m[21](torch.cat([m[19](m4), p5], 1))
        return m[22]([n3, m4, m5])


def make_torch_model(seed=0):
    torch.manual_seed(seed)
    tm = TModel()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(torch.rand_like(mod.running_var) * 0.5 + 0.5)
    tm.eval()
    return tm


@pytest.fixture(scope="module")
def converted():
    tm = make_torch_model()
    variables = convert_weights.convert_state_dict(tm.state_dict(), CFG)
    return tm, variables


def test_full_model_numerical_equivalence(converted):
    tm, variables = converted
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        t_outs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    fm = yolo.Yolo(NC, W, D, dtype=jnp.float32)  # f32 for exact comparison
    f_outs = fm.apply(variables, jnp.asarray(x))

    assert len(t_outs) == len(f_outs) == 3
    for lvl, ((tb, tc), (fb, fc)) in enumerate(zip(t_outs, f_outs)):
        tb = tb.numpy().transpose(0, 2, 3, 1)
        tc = tc.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(fb), tb, atol=2e-4, rtol=1e-3,
                                   err_msg=f"box level {lvl}")
        np.testing.assert_allclose(np.asarray(fc), tc, atol=2e-4, rtol=1e-3,
                                   err_msg=f"cls level {lvl}")


def test_every_param_consumed_and_covered(converted):
    """convert_state_dict raises on unconsumed/missing keys — reaching
    here means the mapping is exhaustive. Also check the tree round-trips
    through the npz save/load format used by make_detector."""
    import flax.traverse_util as tu

    tm, variables = converted
    _, ref = yolo.init_params(CFG)
    assert set(tu.flatten_dict(variables)) == set(tu.flatten_dict(ref))

    import tempfile, os  # noqa: E401

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "w.npz")
        yolo.save_weights(variables, path)
        loaded = yolo.load_weights(path)
        lf = tu.flatten_dict(loaded)
        vf = tu.flatten_dict(variables)
        assert set(lf) == set(vf)
        for k in vf:
            np.testing.assert_array_equal(np.asarray(lf[k]), np.asarray(vf[k]))


def test_shape_mismatch_raises(converted):
    tm, _ = converted
    sd = {k: v.clone() for k, v in tm.state_dict().items()}
    sd["model.0.conv.weight"] = torch.zeros(99, 3, 3, 3)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_weights.convert_state_dict(sd, CFG)


def test_missing_key_raises(converted):
    tm, _ = converted
    sd = {k: v for k, v in tm.state_dict().items()
          if k != "model.9.cv1.conv.weight"}
    with pytest.raises(KeyError, match="model.9.cv1"):
        convert_weights.convert_state_dict(sd, CFG)
