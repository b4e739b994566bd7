"""Compiled-model export/import (runtime/export.py).

OpenVINO blob-cache parity: ``ExecutableNetwork.export`` /
``IECore.import_network`` (2.0: ``compiled_model.export_model`` /
``core.import_model``).  The artifact must round-trip bit-tight and load
WITHOUT the original .xml/.bin — verified by importing from a subprocess
whose cwd has no model files and that never touches the IR front-end.
"""

import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest

from tests.conftest import REPO, model_paths

from pyopenvino_tpu import Config, Core, IECore
from pyopenvino_tpu.config import QuantMode
from pyopenvino_tpu.ir import read_ir_model
from pyopenvino_tpu.runtime.compiler import compile_model
from pyopenvino_tpu.runtime.export import import_compiled


@pytest.fixture(scope="module")
def mnist_export(tmp_path_factory):
    xml, binp = model_paths("mnist")
    net = compile_model(read_ir_model(xml, binp))
    path = str(tmp_path_factory.mktemp("export") / "mnist.ovtpu")
    net.export(path)
    return net, path


def test_roundtrip_b1_and_symbolic_batch(mnist_export, mnist_image):
    net, path = mnist_export
    imp = import_compiled(path)
    assert imp.meta["batched_mode"] == "symbolic"
    assert imp.input_names == net.input_names
    assert imp.output_names == net.output_names

    want = net.infer({"conv2d_input": mnist_image})
    got = imp.infer({"conv2d_input": mnist_image})
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)

    # symbolic batch: sizes never seen at export time
    for b in (3, 7):
        batch = np.repeat(mnist_image[None], b, axis=0)
        wb = net.infer_batch({"conv2d_input": batch})
        gb = imp.infer_batch({"conv2d_input": batch})
        for k in wb:
            assert gb[k].shape[0] == b
            np.testing.assert_allclose(gb[k], wb[k], rtol=1e-6)


def test_artifact_is_self_contained(mnist_export, mnist_image, tmp_path):
    """Import + golden inference from a subprocess that never reads the IR
    (no model paths, no parser import) — the OpenVINO import_network
    contract."""
    _, path = mnist_export
    blob_path = str(tmp_path / "blob.npy")
    np.save(blob_path, mnist_image)
    script = (
        "import os, sys, numpy as np\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from pyopenvino_tpu import IECore\n"
        f"imp = IECore().import_network({path!r})\n"
        f"blob = np.load({blob_path!r})\n"
        "out = imp.infer({'conv2d_input': blob})\n"
        "top3 = np.argsort(next(iter(out.values()))[0])[::-1][:3]\n"
        "assert list(top3) == [2, 0, 1], top3\n"
        "import pyopenvino_tpu.ir.xml_parser as p\n"
        "print('OK')\n"
    )
    # the assertion that matters: the import itself happens before the
    # parser module is ever loaded (checked by import order above: the
    # parser import comes after infer and would mask nothing)
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        cwd=str(tmp_path), timeout=240,
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_int8_full_roundtrip(tmp_path):
    xml, binp = model_paths("mnist")
    rng = np.random.default_rng(0)
    samples = [
        {"conv2d_input": rng.uniform(0, 255, (1, 1, 28, 28)).astype(np.float32)}
        for _ in range(4)
    ]
    net = compile_model(
        read_ir_model(xml, binp), Config(quant=QuantMode.INT8_FULL),
        calibration_samples=samples,
    )
    path = str(tmp_path / "mnist8.ovtpu")
    net.export(path)
    imp = import_compiled(path)
    # int8 weights + scale vectors survive the weight-pytree round-trip
    assert any(np.asarray(v).dtype == np.int8 for v in imp.weights.values())
    blob = rng.uniform(0, 255, (1, 1, 28, 28)).astype(np.float32)
    want = net.infer({"conv2d_input": blob})
    got = imp.infer({"conv2d_input": blob})
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)


def test_api_facades(tmp_path, mnist_image):
    # 1.0 spelling
    xml, binp = model_paths("mnist")
    ie = IECore()
    exe = ie.load_network(ie.read_network(xml, binp), "TPU")
    p1 = str(tmp_path / "a.ovtpu")
    exe.export(p1)
    imp = ie.import_network(p1)
    out = imp.infer({"conv2d_input": mnist_image})
    assert list(np.argsort(next(iter(out.values()))[0])[::-1][:3]) == [2, 0, 1]

    # 2.0 spelling
    core = Core()
    compiled = core.compile_model(core.read_model(xml, binp), "TPU")
    p2 = str(tmp_path / "b.ovtpu")
    compiled.export_model(p2)
    imp2 = core.import_model(p2)
    out2 = imp2.infer({"conv2d_input": mnist_image})
    np.testing.assert_allclose(
        next(iter(out2.values())), next(iter(out.values())), rtol=1e-6
    )


def test_interpreter_backend_refuses_export(tmp_path):
    xml, binp = model_paths("mnist")
    ie = IECore()
    exe = ie.load_network(ie.read_network(xml, binp), "CPU")
    with pytest.raises(ValueError, match="interpreter"):
        exe.export(str(tmp_path / "x.ovtpu"))


def test_import_errors(mnist_export, tmp_path):
    _, path = mnist_export
    # tampered artifact: a missing member fails loudly
    broken = str(tmp_path / "broken.ovtpu")
    with zipfile.ZipFile(path) as src, zipfile.ZipFile(broken, "w") as dst:
        for name in src.namelist():
            if name != "fn_b1.jaxexport":
                dst.writestr(name, src.read(name))
    with pytest.raises(KeyError):
        import_compiled(broken)

    # missing input name fails with the name in the message
    imp = import_compiled(path)
    with pytest.raises(KeyError, match="conv2d_input"):
        imp.infer({"wrong_name": np.zeros((1, 1, 28, 28), np.float32)})


def test_sharded_export_roundtrip(tmp_path, mnist_image):
    """A mesh-sharded network exports per-mesh-shape lowerings; importing
    rebuilds an equally-shaped mesh from local devices and runs the
    sharded programs directly — parity on DISTINCT batch rows (the
    sharding-bug lesson: repeated rows mask shard-indexing errors)."""
    from pyopenvino_tpu.parallel.mesh import (
        MeshConfig, build_mesh, shard_compiled,
    )

    xml, binp = model_paths("mnist")
    net = compile_model(read_ir_model(xml, binp))
    ref_b1 = net.infer({"conv2d_input": mnist_image})
    rng = np.random.default_rng(5)
    rows = np.concatenate(
        [mnist_image] * 2
        + [rng.uniform(0, 255, (6, 1, 28, 28)).astype(np.float32)]
    )
    rows[1] = rows[1][:, :, ::-1]  # distinct from row 0
    ref_bn = net.infer_batch({"conv2d_input": rows})

    shard_compiled(
        net, build_mesh(MeshConfig(data=4, model=2)), tensor_parallel=True
    )
    path = str(tmp_path / "mnist_dp_tp.ovtpu")
    net.export(path, buckets=(8,))

    imp = import_compiled(path)
    assert imp.mesh is not None and int(imp.mesh.devices.size) == 8
    assert imp.meta["mesh"]["axis_names"] == ["data", "model", "spatial"]
    out = imp.infer({"conv2d_input": mnist_image})
    k = next(iter(out))
    np.testing.assert_allclose(out[k], ref_b1[k], rtol=1e-4, atol=1e-5)
    outs = imp.infer_batch({"conv2d_input": rows})
    np.testing.assert_allclose(outs[k], ref_bn[k], rtol=1e-4, atol=1e-5)


def test_stateful_export_roundtrip(tmp_path):
    """A stateful network's .ovtpu carries the step program + the initial
    state pytree; the imported artifact threads donated state, resets,
    and answers query_state — full VariableState surface without the IR."""
    from tests.test_stateful import dynamic_init_model, ema_model

    rng = np.random.default_rng(11)
    seq = [rng.standard_normal((1, 3)).astype(np.float32) for _ in range(4)]
    net = compile_model(ema_model())
    path = str(tmp_path / "ema.ovtpu")
    net.export(path)
    imp = import_compiled(path)
    assert imp.stateful and imp.meta["variables"].keys() == {"ema"}
    ref_net = compile_model(ema_model())
    for x in seq:
        np.testing.assert_allclose(
            imp.infer({"x": x})["out"], ref_net.infer({"x": x})["out"],
            rtol=1e-5, atol=1e-6,
        )
    st = imp.query_state()
    assert st["ema"].shape == (1, 3) and np.abs(st["ema"]).max() > 0
    imp.reset_state()
    np.testing.assert_allclose(
        imp.infer({"x": seq[0]})["out"], 0.25 * seq[0], rtol=1e-5, atol=1e-6
    )
    with pytest.raises(NotImplementedError, match="declared shapes"):
        imp.infer_batch({"x": np.zeros((4, 3), np.float32)})

    # dynamic-init variables: the serialized fresh flag makes the FIRST
    # imported infer capture the traced init, like the live network
    dyn = compile_model(dynamic_init_model())
    dpath = str(tmp_path / "dyn.ovtpu")
    dyn.export(dpath)
    dimp = import_compiled(dpath)
    x = seq[0][:, :3]
    x4 = np.concatenate([x, x[:, :1]], axis=1)  # (1,4)
    np.testing.assert_allclose(
        dimp.infer({"x": x4})["out"], 3 * x4, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        dimp.infer({"x": x4})["out"], 4 * x4, rtol=1e-5, atol=1e-6
    )


def test_stateful_sharded_export_refused(tmp_path):
    from pyopenvino_tpu.parallel.mesh import (
        MeshConfig, build_mesh, shard_compiled,
    )
    from tests.test_stateful import ema_model

    net = compile_model(ema_model())
    net.mesh = build_mesh(MeshConfig(data=2, model=1))
    with pytest.raises(NotImplementedError, match="stateful \\+ sharded"):
        net.export(str(tmp_path / "x.ovtpu"))
