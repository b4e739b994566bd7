"""Depthwise emission modes (config.depthwise_mode) + int8 depthwise.

Round 1 shipped depthwise as shifted multiply-accumulates because the
backend's grouped-conv compile hung; the current stack compiles it, and
native feature_group_count conv measured ~5x faster on the chip — the
default flipped to "native" with "shifted_mac" kept as an escape hatch.
Both must agree numerically, and the INT8-FULL grouped path must match the
fp32 reference within quantization tolerance.
"""

import numpy as np
import pytest

from pyopenvino_tpu import IECore
from pyopenvino_tpu.config import Backend, Config, QuantMode
from tests.conftest import model_paths


@pytest.fixture(scope="module")
def ssd_net():
    """One IR parse + weight decode for the whole module — the 366-layer
    SSD is the most expensive model to parse and each test compiles it
    under several configs."""
    ie = IECore()
    xml, binp = model_paths("ssd_mobilenet_v1_coco")
    return ie, ie.read_network(xml, binp)


def _ssd_infer(ssd_net, cfg, blob, calibration=None):
    ie, net = ssd_net
    exe = ie.load_network(net, "TPU", config=cfg)
    if calibration:
        exe.set_calibration(calibration)
    return exe.infer({"image_tensor": blob})


def test_native_and_shifted_mac_agree(ssd_net):
    rng = np.random.default_rng(3)
    blob = rng.uniform(0, 255, (1, 3, 300, 300)).astype(np.float32)
    a = _ssd_infer(ssd_net,
                   Config(backend=Backend.XLA, depthwise_mode="native"), blob)
    b = _ssd_infer(
        ssd_net, Config(backend=Backend.XLA, depthwise_mode="shifted_mac"),
        blob
    )
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5)


def test_int8_full_depthwise_runs_and_tracks_fp32(ssd_net):
    rng = np.random.default_rng(4)
    blob = rng.uniform(0, 255, (1, 3, 300, 300)).astype(np.float32)
    cal = [{"image_tensor": blob}]
    ref = _ssd_infer(ssd_net, Config(backend=Backend.XLA), blob)
    got = _ssd_infer(
        ssd_net, Config(backend=Backend.XLA, quant=QuantMode.INT8_FULL),
        blob, cal
    )
    # records: [n, cls, conf, box*4] — the top record's class matches and
    # its confidence is within quantization tolerance
    r = next(iter(ref.values())).reshape(-1, 7)
    g = next(iter(got.values())).reshape(-1, 7)
    assert r[0, 0] == g[0, 0] == 0
    assert r[0, 1] == g[0, 1]
    assert abs(r[0, 2] - g[0, 2]) < 0.05


def test_act_scales_cover_group_convolutions():
    """calibrate_activations now assigns scales to GroupConvolution inputs."""
    from pyopenvino_tpu.ir import read_ir_model
    from pyopenvino_tpu.passes.calibrate import calibrate_activations

    xml, binp = model_paths("ssd_mobilenet_v1_coco")
    model = read_ir_model(xml, binp)
    rng = np.random.default_rng(5)
    samples = [
        {"image_tensor": rng.uniform(0, 255, (1, 3, 300, 300)).astype(
            np.float32)}
    ]
    scales = calibrate_activations(model, samples)
    gc_ids = [n.id for n in model.find_by_type("GroupConvolution")]
    assert gc_ids and all(nid in scales for nid in gc_ids)
