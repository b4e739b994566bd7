"""AsyncInferQueue (api.py) — OpenVINO 2.0 throughput-mode request pool.

Callback ordering, userdata plumbing, slot blocking, error surfacing, and
coalescing into the continuous-batching server.
"""

import threading
import time

import numpy as np
import pytest

from pyopenvino_tpu import AsyncInferQueue, Config, Core, IECore
from tests.conftest import model_paths


@pytest.fixture(scope="module")
def compiled_model():
    core = Core()
    xml, binp = model_paths("mnist")
    model = core.read_model(xml, binp)
    compiled = core.compile_model(
        model, "TPU", config=Config(batch_buckets=(1, 2, 4, 8))
    )
    yield compiled
    compiled._exe.close()


def test_callbacks_and_userdata(compiled_model, mnist_image):
    q = AsyncInferQueue(compiled_model, jobs=4)
    got = {}
    lock = threading.Lock()

    def cb(request, userdata):
        top = np.argsort(next(iter(request.output_blobs.values()))[0])[::-1]
        with lock:
            got[userdata] = list(top[:3])

    q.set_callback(cb)
    assert len(q) == 4
    assert q.is_ready()
    for i in range(12):
        q.start_async({"conv2d_input": mnist_image}, userdata=i)
    q.wait_all()
    assert sorted(got) == list(range(12))
    assert all(v == [2, 0, 1] for v in got.values())
    # server coalesced concurrent slots into shared launches
    stats = compiled_model._exe._server.stats
    assert stats.requests >= 12


def test_start_async_blocks_until_slot_free(compiled_model, mnist_image):
    q = AsyncInferQueue(compiled_model, jobs=2)
    release = threading.Event()

    def slow_cb(request, userdata):
        release.wait(timeout=30)

    q.set_callback(slow_cb)
    q.start_async({"conv2d_input": mnist_image}, userdata=0)
    q.start_async({"conv2d_input": mnist_image}, userdata=1)

    third_submitted = threading.Event()

    def submit_third():
        q.start_async({"conv2d_input": mnist_image}, userdata=2)
        third_submitted.set()

    t = threading.Thread(target=submit_third)
    t.start()
    time.sleep(0.3)
    # both slots busy (callbacks parked) → the third submission is blocked
    assert not third_submitted.is_set()
    assert not q.is_ready()
    release.set()
    t.join(timeout=30)
    assert third_submitted.is_set()
    q.wait_all()


def test_error_surfaces_at_start_async(compiled_model, mnist_image):
    q = AsyncInferQueue(compiled_model, jobs=2)
    # malformed input: submit-time validation raises synchronously (the
    # server refuses it before it can poison a coalesced batch) and the
    # slot returns to the pool
    bad = np.zeros((1, 1, 5, 5), np.float32)
    with pytest.raises(ValueError):
        q.start_async({"conv2d_input": bad})
    assert q.is_ready()
    q.wait_all()  # nothing in flight; must not hang
    # the pool is still fully usable afterwards
    q.start_async({"conv2d_input": mnist_image})
    q.wait_all()


def test_requests_indexable(compiled_model, mnist_image):
    q = AsyncInferQueue(compiled_model, jobs=3)
    q.start_async({"conv2d_input": mnist_image})
    q.wait_all()
    assert len(list(iter(q))) == 3
    blobs = [q[i].output_blobs for i in range(3)]
    done = [b for b in blobs if b]
    assert len(done) == 1  # exactly the one submitted job produced outputs


def test_accepts_legacy_executable_network(mnist_image):
    ie = IECore()
    xml, binp = model_paths("mnist")
    exe = ie.load_network(ie.read_network(xml, binp), "TPU")
    q = AsyncInferQueue(exe, jobs=2)
    seen = []
    q.set_callback(lambda r, u: seen.append(u))
    q.start_async({"conv2d_input": mnist_image}, userdata="a")
    q.wait_all()
    assert seen == ["a"]
    exe.close()

    with pytest.raises(TypeError):
        AsyncInferQueue(object())
