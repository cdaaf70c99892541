"""Native host runtime tests: C++ queue/handshake/pacer/pixel path + the
full three-thread pipeline."""

import threading
import time

import numpy as np
import pytest

from esp32_fluid_simulation_tpu.io_host.native import (
    DragQueue, FrameHandshake, FramePacer, rgb565_to_rgb888, load_library)


def test_library_builds():
    assert load_library() is not None


def test_drag_queue_fifo_and_lossy():
    q = DragQueue(capacity=4)
    for k in range(6):  # 2 more than capacity -> dropped (xQueueSend(,0))
        q.try_push(k, k + 1, float(k), -float(k))
    assert q.dropped == 2
    out = q.drain()
    assert [d[0] for d in out] == [0, 1, 2, 3]
    assert out[1] == (1, 2, 1.0, -1.0)
    assert q.drain() == []
    # queue usable again after drain
    assert q.try_push(9, 9, 1.0, 1.0)
    assert q.drain()[0][0] == 9


def test_drag_queue_threaded():
    q = DragQueue(capacity=64)
    got = []

    def producer():
        for k in range(500):
            while not q.try_push(k, 0, 0.0, 0.0):
                time.sleep(0)

    def consumer():
        while len(got) < 500:
            got.extend(d[0] for d in q.drain())

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t2.start(); t1.start(); t1.join(); t2.join()
    # every element arrives exactly once, in order (retried pushes count as
    # drops in the stats but deliver eventually)
    assert got == list(range(500))


def test_handshake_rendezvous():
    h = FrameHandshake()
    log = []

    # producer may write frame 0 immediately (primed, .ino:243)
    assert h.producer_acquire(timeout_ms=100)
    # consumer must NOT get a frame yet
    assert not h.consumer_acquire(timeout_ms=50)
    h.producer_publish()
    assert h.consumer_acquire(timeout_ms=100)
    # producer now blocks until consumer releases
    assert not h.producer_acquire(timeout_ms=50)
    h.consumer_release()
    assert h.producer_acquire(timeout_ms=100)


def test_pacer_rate():
    p = FramePacer(fps=200.0)
    t0 = time.time()
    for _ in range(20):
        p.wait()
    dt = time.time() - t0
    assert 0.07 < dt < 0.5  # ~100 ms nominal, generous upper bound


def test_rgb565_roundtrip():
    from esp32_fluid_simulation_tpu.render import pack_rgb565
    import jax.numpy as jnp
    rgb = np.random.default_rng(0).random((3, 16, 24)).astype(np.float32)
    frame = np.asarray(pack_rgb565(jnp.asarray(rgb), bswap=True))
    out = rgb565_to_rgb888(frame, swapped=True)
    assert out.shape == (16, 24, 3)
    # 5/6-bit quantization: within ~1/32 + replication error
    np.testing.assert_allclose(out[..., 0] / 255.0, rgb[0], atol=0.05)
    np.testing.assert_allclose(out[..., 1] / 255.0, rgb[1], atol=0.03)
    np.testing.assert_allclose(out[..., 2] / 255.0, rgb[2], atol=0.05)


def test_full_pipeline():
    from esp32_fluid_simulation_tpu import SimConfig
    from esp32_fluid_simulation_tpu.io_host.pipeline import SimPipeline

    frames = []
    cfg = SimConfig(shape=(17, 25), sor_iters=4)
    pipe = SimPipeline(cfg, lambda rgb, n: frames.append(rgb), fps=500.0)
    # poke a drag mid-run from this thread (the touch task's role)
    pipe.push_drag(8, 12, 150.0, -100.0)
    delivered = pipe.run(n_frames=6)
    assert delivered == 6
    assert frames[0].shape == (16 * 4, 24 * 4, 3)
    assert all(np.isfinite(f).all() for f in frames)
    # the drag must have stirred the dye by the last frame
    assert not np.array_equal(frames[0], frames[-1])


def test_http_server_roundtrip():
    """The interactive web shell: drags in over HTTP, frames out."""
    import json
    import urllib.request
    from esp32_fluid_simulation_tpu import SimConfig
    from esp32_fluid_simulation_tpu.io_host.server import serve

    cfg = SimConfig(shape=(17, 25), sor_iters=4)
    sim, httpd = serve(cfg, port=18731, fps=120.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = "http://127.0.0.1:18731"
        # wait for first frames
        deadline = time.time() + 60
        while time.time() < deadline:
            stats = json.loads(urllib.request.urlopen(base + "/stats",
                                                      timeout=5).read())
            if stats["steps"] > 3:
                break
            time.sleep(0.5)
        assert stats["steps"] > 3
        req = urllib.request.Request(
            base + "/drag", method="POST",
            data=json.dumps({"from": [0.4, 0.5], "to": [0.6, 0.5]}).encode())
        assert urllib.request.urlopen(req, timeout=5).status == 204
        f1 = urllib.request.urlopen(base + "/frame", timeout=5).read()
        time.sleep(0.3)
        f2 = urllib.request.urlopen(base + "/frame", timeout=5).read()
        assert len(f1) > 100 and f1 != f2  # frames advance
        page = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"/stream" in page and b"pointerdown" in page
    finally:
        sim.stop()
        httpd.shutdown()


def test_pipeline_sink_exception_does_not_hang():
    from esp32_fluid_simulation_tpu import SimConfig
    from esp32_fluid_simulation_tpu.io_host.pipeline import SimPipeline

    def bad_sink(rgb, n):
        raise RuntimeError("disk full")

    cfg = SimConfig(shape=(17, 25), sor_iters=2)
    pipe = SimPipeline(cfg, bad_sink, fps=500.0)
    t0 = time.time()
    import pytest
    with pytest.raises(RuntimeError, match="disk full"):
        pipe.run(n_frames=10)
    assert time.time() - t0 < 60  # must terminate, not deadlock


def test_jpeg_encode_rgb8():
    """Native libjpeg-turbo encode (VERDICT r4 next #6): valid JPEG that
    decodes back to approximately the input."""
    from esp32_fluid_simulation_tpu.io_host.native import (jpeg_available,
                                                           jpeg_encode_rgb8)
    if not jpeg_available():
        pytest.skip("libfluidhost built without libjpeg")
    rng = np.random.default_rng(1)
    # smooth image so quality-85 decode error is small
    base = rng.random((6, 8, 3))
    rgb = (np.kron(base, np.ones((20, 20, 1))) * 255).astype(np.uint8)
    data = jpeg_encode_rgb8(rgb, quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    from PIL import Image
    import io
    back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).mean() < 8


def test_jpeg_encode_rgbx_matches_rgb8():
    """The packed-RGBX path (JCS_EXT_RGBX) produces byte-identical JPEGs
    to the HWC path for the same pixels."""
    from esp32_fluid_simulation_tpu.io_host.native import (
        jpeg_available, jpeg_rgbx_available, jpeg_encode_rgb8,
        jpeg_encode_rgbx)
    if not (jpeg_available() and jpeg_rgbx_available()):
        pytest.skip("libfluidhost built without libjpeg JCS_EXT_RGBX")
    rng = np.random.default_rng(2)
    rgb = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    rgbx = (rgb[..., 0].astype(np.uint32)
            | (rgb[..., 1].astype(np.uint32) << 8)
            | (rgb[..., 2].astype(np.uint32) << 16))
    assert jpeg_encode_rgbx(rgbx, 90) == jpeg_encode_rgb8(rgb, 90)


def test_render_rgbx_matches_rgb8():
    """render_rgbx packs exactly render_rgb8's bytes into uint32 planes."""
    import jax.numpy as jnp
    from esp32_fluid_simulation_tpu.render import render_rgb8
    from esp32_fluid_simulation_tpu.render.upscale import render_rgbx
    rng = np.random.default_rng(3)
    color = jnp.asarray(rng.random((3, 13, 17)).astype(np.float32))
    rgb8 = np.asarray(render_rgb8(color, s=4))          # [3, H, W]
    rgbx = np.asarray(render_rgbx(color, s=4))          # [H, W] uint32
    np.testing.assert_array_equal(rgbx & 0xFF, rgb8[0])
    np.testing.assert_array_equal((rgbx >> 8) & 0xFF, rgb8[1])
    np.testing.assert_array_equal((rgbx >> 16) & 0xFF, rgb8[2])


def test_decimate_mean():
    """decimate_mean == d x d block average (the stream view downsample)."""
    import jax.numpy as jnp
    from esp32_fluid_simulation_tpu.render.upscale import decimate_mean
    rng = np.random.default_rng(4)
    x = rng.random((3, 12, 20)).astype(np.float32)
    got = np.asarray(decimate_mean(jnp.asarray(x), 4))
    want = x.reshape(3, 3, 4, 5, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # d=1 is the identity
    np.testing.assert_array_equal(np.asarray(decimate_mean(jnp.asarray(x), 1)),
                                  x)


def test_decimate_mean_non_divisible():
    """Non-divisible dims crop to the largest d-multiple (the reference's
    own 61x81 grid divides by nothing; --stream-decim must accept it)."""
    import jax.numpy as jnp
    from esp32_fluid_simulation_tpu.render.upscale import decimate_mean
    rng = np.random.default_rng(5)
    x = rng.random((3, 61, 81)).astype(np.float32)
    got = np.asarray(decimate_mean(jnp.asarray(x), 2))
    assert got.shape == (3, 30, 40)
    want = x[:, :60, :80].reshape(3, 30, 2, 40, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # d=3 on 1000-ish odd dims
    y = rng.random((3, 10, 7)).astype(np.float32)
    got3 = np.asarray(decimate_mean(jnp.asarray(y), 3))
    assert got3.shape == (3, 3, 2)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decimate_mean(jnp.asarray(y), 11)
