"""Owned streaming inflate (native/stitchnative.cpp owned_inflate) vs the
CPython zlib oracle: every block type, strategy, chunking pattern, and the
suspend/resume paths (input-starved and output-limited)."""

import zlib

import numpy as np
import pytest

from image_stitch_tpu.errors import StitchError

pytest.importorskip("image_stitch_tpu.native")
from image_stitch_tpu.native import NativeInflater, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def roundtrip(raw: bytes, level: int, strategy: int = 0, chunk: int | None = None):
    co = zlib.compressobj(level, zlib.DEFLATED, 15, 8, strategy)
    comp = co.compress(raw) + co.flush()
    inf = NativeInflater()
    out = b""
    step = chunk or max(1, len(comp))
    for i in range(0, len(comp), step):
        out += inf.push(comp[i : i + step])
    out += inf.finish()
    assert out == raw


def corpus():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 255, 512, dtype=np.float32)
    gradient = ((x[None, :] * 0.7 + x[:, None] * 0.3).astype(np.uint8)).tobytes()
    return [
        ("gradient", gradient),
        ("noise", rng.integers(0, 256, 1 << 17, dtype=np.uint8).tobytes()),
        ("zeros", bytes(1 << 17)),
        ("tiny", b"hello world" * 3),
        ("empty", b""),
        ("repeat", b"abcabcabc" * 5000),
    ]


@pytest.mark.parametrize("level", [0, 1, 6, 9])
@pytest.mark.parametrize("strategy", [0, zlib.Z_RLE, zlib.Z_FILTERED])
def test_roundtrip_all_block_types(level, strategy):
    for _, raw in corpus():
        roundtrip(raw, level, strategy)


@pytest.mark.parametrize("chunk", [1, 7, 4096])
def test_resume_across_arbitrary_input_chunks(chunk):
    """Input starvation can suspend anywhere — mid-header, mid-match,
    mid-stored-block — and must resume bit-exactly."""
    for _, raw in corpus():
        if len(raw) > 1 << 16 and chunk == 1:
            continue  # 1-byte pushes on big payloads are CI-slow, not more revealing
        roundtrip(raw, 6, 0, chunk)
        roundtrip(raw, 0, 0, chunk)  # stored blocks


def test_output_limited_resume():
    """The Python wrapper drains through fixed-size output buffers; matches
    spanning buffer boundaries exercise the pending-copy path."""
    raw = b"A" * 100000 + bytes(np.arange(256, dtype=np.uint8)) * 400
    roundtrip(raw, 9)


def test_fuzz_vs_zlib():
    for seed in range(15):
        r = np.random.default_rng(seed)
        n = int(r.integers(0, 60000))
        raw = (r.integers(0, 256, n, dtype=np.uint8) >> int(r.integers(0, 8))).tobytes()
        comp = zlib.compress(raw, int(r.integers(0, 10)))
        inf = NativeInflater()
        out = b""
        i = 0
        while i < len(comp):
            cs = int(r.integers(1, 5000))
            out += inf.push(comp[i : i + cs])
            i += cs
        out += inf.finish()
        assert out == raw, f"seed {seed}"


def test_truncated_stream_rejected():
    comp = zlib.compress(b"some data here", 6)
    inf = NativeInflater()
    inf.push(comp[: len(comp) // 2])
    with pytest.raises(StitchError, match="[Tt]runcated"):
        inf.finish()


def test_corrupt_stream_rejected():
    comp = bytearray(zlib.compress(b"x" * 5000, 6))
    comp[10] ^= 0xFF
    inf = NativeInflater()
    with pytest.raises(StitchError):
        inf.push(bytes(comp))
        inf.finish()


def test_bad_zlib_header_rejected():
    inf = NativeInflater()
    with pytest.raises(StitchError):
        inf.push(b"\x00\x00datadata")


def test_residual_data_rejected():
    comp = zlib.compress(b"payload", 6) + b"EXTRA"
    inf = NativeInflater()
    with pytest.raises(StitchError, match="residual"):
        inf.push(comp)


def test_push_after_finish_rejected():
    comp = zlib.compress(b"done", 6)
    inf = NativeInflater()
    inf.push(comp)
    with pytest.raises(StitchError, match="finished"):
        inf.push(b"more")


def test_streaming_inflator_dispatches_to_native():
    from image_stitch_tpu.io.inflate import StreamingInflator

    inf = StreamingInflator()
    assert isinstance(inf, NativeInflater)
    out = inf.push(zlib.compress(b"dispatch check", 6)) + inf.finish()
    assert out == b"dispatch check"


def test_strict_mode_verifies_adler():
    from image_stitch_tpu.io.inflate import StreamingInflator

    # Corrupt the Adler-32 trailer: strict catches it, lenient doesn't.
    comp = bytearray(zlib.compress(b"adler check payload", 6))
    comp[-1] ^= 0xFF
    with pytest.raises(StitchError):
        s = StreamingInflator(strict=True)
        s.push(bytes(comp))
        s.finish()
    lenient = StreamingInflator()
    out = lenient.push(bytes(comp)) + lenient.finish()
    assert out == b"adler check payload"


def test_tiny_output_slices_bit_exact():
    """Sub-match-length output buffers must not corrupt the stream.

    Regression: when a resumed match copy filled the whole output buffer,
    the decoder fell through into the symbol loop; a following match then
    clobbered pending_len/pending_dist and dropped the unfinished match's
    remaining bytes (first seen with 1-4 byte buffers on level-8 streams).
    Also exercises the packed multi-literal entries' pending-literal parking.
    """
    import numpy as np

    rng = np.random.default_rng(42)
    for kind in range(3):
        n = 4000
        if kind == 0:
            raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:
            # 4-value alphabet -> ~2-bit codes -> packed LIT2/LIT3 entries
            raw = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        else:
            base = rng.integers(0, 256, 37, dtype=np.uint8).tobytes()
            raw = (base * (n // 37 + 1))[:n]
        comp = zlib.compress(raw, 8)
        for size in (1, 2, 3, 5, 7):
            inf = NativeInflater()
            inf.feed(comp)
            buf = np.empty(size, dtype=np.uint8)
            acc = bytearray()
            while True:
                got = inf.drain_into(buf)
                if got == 0:
                    break
                acc += buf[:got].tobytes()
            inf.verify_finished()
            assert bytes(acc) == raw, (kind, size)


def test_empty_input_after_compaction_mid_stream():
    """Regression: when the accreted input compacts down to ZERO bytes
    mid-stream (in_pos == len(input) at a compaction point), the next
    drain_into passes in=NULL/in_len=0 to the C decoder. The pointer-form
    fast-loop guard `in + in_len - 8` underflowed from NULL and the refill
    dereferenced it (segfault). The guard must be integer-form."""
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 64, 6 << 20, dtype=np.uint8).tobytes()
    comp = zlib.compress(raw, 6)
    inf = NativeInflater()
    inf._COMPACT_AT = 1 << 12  # force frequent, often-exact compactions
    out = np.empty(1 << 14, dtype=np.uint8)
    got = bytearray()
    pos = 0
    saw_empty = False
    while len(got) < len(raw):
        n = inf.drain_into(out)
        if n == 0:
            if not len(inf._input):
                saw_empty = True
            if pos < len(comp):
                inf.feed(comp[pos : pos + 65536])
                pos += 65536
            elif inf.finished:
                break
            else:
                raise AssertionError("stalled")
        else:
            got += out[:n].tobytes()
    assert bytes(got) == raw
    # The scenario under test must actually occur: drain calls with a fully
    # consumed (empty) input buffer.
    assert saw_empty


def test_strict_mode_native_verifies_adler():
    """Strict mode now stays on the owned tier: the C decoder parses the
    trailer, the wrapper checks it against a zlib.adler32 accumulation.
    Both the push and the drain_into surfaces must verify, and a corrupted
    trailer must raise while default mode (chunk-CRC-covered) stays lax."""
    from image_stitch_tpu.io.inflate import StreamingInflator

    rng = np.random.default_rng(4)
    raw = rng.integers(0, 64, 1 << 18, dtype=np.uint8).tobytes()
    comp = zlib.compress(raw, 6)

    inf = StreamingInflator(strict=True)
    assert isinstance(inf, NativeInflater)  # native tier handles strict now
    out = inf.push(comp) + inf.finish()
    assert out == raw

    # Corrupt the Adler trailer (last 4 bytes): strict raises, default not.
    bad = comp[:-4] + bytes(b ^ 0xFF for b in comp[-4:])
    inf2 = StreamingInflator(strict=True)
    with pytest.raises(StitchError, match="Adler-32 mismatch"):
        inf2.push(bad)
        inf2.finish()
    lax = NativeInflater()
    assert lax.push(bad) + lax.finish() == raw

    # drain_into surface with banded output and a corrupt trailer.
    inf3 = NativeInflater(strict=True)
    inf3.feed(bad)
    buf = np.empty(1 << 14, dtype=np.uint8)
    with pytest.raises(StitchError, match="Adler-32 mismatch"):
        while True:
            if inf3.drain_into(buf) == 0 and inf3.finished:
                break


def test_verify_crc_reachable_from_public_options():
    """decoderOptions.verifyCrc plumbs through the factory to the PNG
    decoder's strict tier (previously only reachable by constructing
    PngDecoder directly)."""
    import io

    from PIL import Image

    from image_stitch_tpu import concat_to_buffer

    rng = np.random.default_rng(6)
    arr = rng.integers(0, 255, (40, 40, 4)).astype(np.uint8)
    # Build a tile via PIL (independent producer)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGBA").save(buf, "PNG")
    tile = buf.getvalue()
    out = concat_to_buffer(
        {"inputs": [tile], "layout": {"columns": 1},
         "decoderOptions": {"verifyCrc": True}}
    )
    assert np.array_equal(np.asarray(Image.open(io.BytesIO(out))), arr)
    # Flip a byte inside the IDAT payload: strict rejects, default decodes
    # or rejects cleanly but never crashes (corruption-fuzz contract).
    bad = bytearray(tile)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(StitchError):
        concat_to_buffer(
            {"inputs": [bytes(bad)], "layout": {"columns": 1},
             "decoderOptions": {"verifyCrc": True}}
        )


def test_buffer_pool_reentrant_from_finalizer():
    """put() allocates inside its locked region (setdefault/append), which
    can trigger GC; NativeInflater.__del__ returns its state buffer to the
    same pool. With a non-reentrant lock that self-deadlocks the thread
    (found by the round-4 PNG soak, single-threaded). The pool lock must
    admit re-entry from a finalizer running in the same thread."""
    import threading

    import numpy as np

    from image_stitch_tpu.native import BufferPool

    pool = BufferPool()

    def worker():
        class Fin:
            def __init__(self):
                self.buf = np.empty(64, np.uint8)

            def __del__(self):
                pool.put(self.buf)

        import gc

        f = Fin()
        cyc = [f]
        cyc.append(cyc)
        del f, cyc  # now only reachable via the collector
        with pool._lock:  # simulate being inside put()'s critical section
            gc.collect()  # runs Fin.__del__ -> pool.put -> re-entry

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(10)
    assert not t.is_alive(), "BufferPool deadlocked on finalizer re-entry"
    assert pool.get(64) is not None
