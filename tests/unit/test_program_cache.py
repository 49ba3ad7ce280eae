"""Bounded executable-cache hygiene (ops/program_cache).

XLA keeps one executable per distinct jitted input shape; the round-3
mesh soak drove an adversarial mixed-shape device stream into an LLVM
"Cannot allocate memory" abort and mitigated it manually with periodic
jax.clear_caches(). These tests pin the automatic production mitigation:
past STITCH_TPU_PROGRAM_CACHE_LIMIT distinct program signatures the
registry flushes the jit caches, and a mixed-shape encode stream stays
byte-exact across flushes.
"""

import numpy as np
import pytest

from image_stitch_tpu.ops import program_cache


def test_note_program_flushes_past_limit(monkeypatch):
    monkeypatch.setenv("STITCH_TPU_PROGRAM_CACHE_LIMIT", "4")
    monkeypatch.setattr(program_cache, "_seen", set())
    flushes = []
    import jax

    real_clear = jax.clear_caches
    monkeypatch.setattr(
        jax, "clear_caches", lambda: (flushes.append(1), real_clear())[1]
    )
    for i in range(4):
        program_cache.note_program("p", i)
    assert not flushes  # at the limit, not past it
    # Repeats are not new signatures.
    for i in range(4):
        program_cache.note_program("p", i)
    assert not flushes
    program_cache.note_program("p", 99)
    assert len(flushes) == 1
    # Counter reset: the next distinct signatures accumulate afresh.
    for i in range(100, 104):
        program_cache.note_program("p", i)
    assert len(flushes) == 1


def test_note_program_disabled(monkeypatch):
    monkeypatch.setenv("STITCH_TPU_PROGRAM_CACHE_LIMIT", "0")
    monkeypatch.setattr(program_cache, "_seen", set())
    for i in range(50):
        program_cache.note_program("q", i)
    assert not program_cache._seen  # disabled: nothing tracked


def test_mixed_shape_device_stream_flushes_and_stays_exact(monkeypatch):
    """The r3-s2 soak pattern, default-on: adversarial mixed canvas shapes
    through the fused device encoder must trigger automatic cache flushes
    (no manual jax.clear_caches in user code) and keep every stream
    byte-identical to the host backend."""
    from image_stitch_tpu.codecs.jpeg.encoder import StreamingJpegEncoder

    monkeypatch.setenv("STITCH_TPU_PROGRAM_CACHE_LIMIT", "6")
    monkeypatch.setattr(program_cache, "_seen", set())
    before = program_cache.flush_count()

    rng = np.random.default_rng(7)

    def encode(backend, w, h):
        img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        e = StreamingJpegEncoder(w, h, 85, backend=backend,
                                 restart_interval_rows=1)
        out = b"".join(e.encode_band(img)) + b"".join(e.finish())
        return img, out

    # 8 distinct canvas shapes x (groups program + quantize shapes) blows
    # through the limit of 6 several times over.
    for i, (w, h) in enumerate(
        [(24, 16), (32, 16), (40, 16), (48, 16), (56, 16), (64, 16),
         (72, 16), (80, 16)]
    ):
        state = rng.bit_generator.state
        img, dev = encode("jax", w, h)
        rng.bit_generator.state = state  # same pixels for the host run
        img2, host = encode("numpy", w, h)
        np.testing.assert_array_equal(img, img2)
        assert dev == host, f"shape {(w, h)} diverged after cache flush"
    assert program_cache.flush_count() > before
