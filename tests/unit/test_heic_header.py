"""HEIC header-without-decode (codecs/heic.parse_heic_header): ISO-BMFF
pitm/ipma/ipco/ispe/irot walking on synthetic boxes — the superset over the
reference's decode-on-header wart (heic-decoder.ts:256-261)."""

import numpy as np

from image_stitch_tpu.codecs.heic import HeicDecoder, parse_heic_header
from image_stitch_tpu.types import DecoderOptions


def box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def fullbox(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def ispe(w: int, h: int) -> bytes:
    return fullbox(b"ispe", w.to_bytes(4, "big") + h.to_bytes(4, "big"))


def irot(angle_ccw_quarters: int) -> bytes:
    return box(b"irot", bytes([angle_ccw_quarters & 3]))


def ipma(item_id: int, prop_indices: list[int]) -> bytes:
    body = (1).to_bytes(4, "big")  # entry_count
    body += item_id.to_bytes(2, "big")  # version 0
    body += bytes([len(prop_indices)])
    for idx in prop_indices:
        body += bytes([idx & 0x7F])  # flags bit0 = 0: 1-byte ids
    return fullbox(b"ipma", body)


def heic_bytes(ipco_children: list[bytes], primary_id: int | None = None,
               assoc: list[int] | None = None) -> bytes:
    meta_body = b""
    if primary_id is not None:
        meta_body += fullbox(b"pitm", primary_id.to_bytes(2, "big"))
    iprp_body = box(b"ipco", b"".join(ipco_children))
    if assoc is not None and primary_id is not None:
        iprp_body += ipma(primary_id, assoc)
    meta_body += box(b"iprp", iprp_body)
    ftyp = box(b"ftyp", b"heic" + (0).to_bytes(4, "big") + b"mif1heic")
    return ftyp + fullbox(b"meta", meta_body)


def test_primary_item_ispe_selected_via_ipma():
    # Thumbnail ispe is LARGER here to prove association wins over size.
    data = heic_bytes(
        [ispe(9999, 9999), ispe(640, 480)], primary_id=1, assoc=[2]
    )
    assert parse_heic_header(data) == (640, 480)


def test_irot_90_swaps_dimensions():
    data = heic_bytes([ispe(640, 480), irot(1)], primary_id=1, assoc=[1, 2])
    assert parse_heic_header(data) == (480, 640)


def test_irot_180_keeps_dimensions():
    data = heic_bytes([ispe(640, 480), irot(2)], primary_id=1, assoc=[1, 2])
    assert parse_heic_header(data) == (640, 480)


def test_largest_ispe_fallback_without_ipma():
    data = heic_bytes([ispe(160, 120), ispe(4032, 3024)])
    assert parse_heic_header(data) == (4032, 3024)


def test_garbage_returns_none():
    assert parse_heic_header(b"not a heif file at all" * 4) is None
    assert parse_heic_header(b"") is None
    # meta box present but empty
    assert parse_heic_header(fullbox(b"meta", b"")) is None


def test_get_header_needs_no_backend():
    """The decoder answers get_header from the boxes alone — no pillow-heif,
    no custom decoder, no decode."""
    data = heic_bytes([ispe(320, 200)], primary_id=1, assoc=[1])
    dec = HeicDecoder(data)
    header = dec.get_header()
    assert (header.width, header.height) == (320, 200)
    assert dec._pixels is None  # decode still deferred


def test_get_header_falls_back_to_decode():
    calls = []

    def fake(data):
        calls.append(1)
        return np.zeros((7, 5, 4), np.uint8)

    # No ispe anywhere: header must come from the (injected) decode.
    data = heic_bytes([])
    dec = HeicDecoder(data, DecoderOptions(custom_decoders={"heic": fake}))
    header = dec.get_header()
    assert (header.width, header.height) == (5, 7)
    assert calls == [1]
