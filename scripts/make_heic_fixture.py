#!/usr/bin/env python
"""Generate the repo's HEIC test fixture (tests/fixtures/heic/).

No HEIC encoder exists in this environment (no pillow-heif, no libheif
tools, no network), so the fixture is CONSTRUCTED, not captured — but with
real syntax at every layer the header path touches:

- canonical ISO-BMFF layout (ftyp [heic, mif1] / meta{hdlr pict, pitm,
  iinf/infe hvc1, iprp{ipco, ipma}, iloc} / mdat), the box order libheif
  emits;
- GENUINE hand-encoded HEVC parameter sets (VPS/SPS/PPS per ITU-T H.265
  §7.3: profile_tier_level, Exp-Golomb fields, emulation prevention) in
  the hvcC record — the SPS really encodes the image dimensions, and the
  test suite independently re-parses it to prove that;
- the mdat slice payload is a DOCUMENTED PLACEHOLDER (hand-writing a
  CABAC-coded IDR slice is out of scope): full pixel decode through a
  real backend would reject it, which matches this repo's gated state —
  pillow-heif is not installable here, so pixel e2e runs only via
  injected decoders (tests/integration/test_heic_e2e.py).

Reference posture being mirrored: heic-decoder.ts:256-285 (header parse +
optional decode peers).
"""

from __future__ import annotations

import os
import struct


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:  # Exp-Golomb unsigned
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, value: int) -> None:  # Exp-Golomb signed
        self.ue(2 * abs(value) - 1 if value > 0 else -2 * value)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def emulation_prevent(rbsp: bytes) -> bytes:
    """Insert 0x03 after any 00 00 preceding 00/01/02/03 (H.265 §7.4.2)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal(nal_type: int, rbsp: bytes) -> bytes:
    header = bytes([(nal_type << 1) & 0x7E, 0x01])  # layer 0, tid_plus1 1
    return header + emulation_prevent(rbsp)


PROFILE_IDC = 1  # Main
LEVEL_IDC = 90  # level 3.0 (plenty for 64x48)


def profile_tier_level(w: BitWriter) -> None:
    w.u(0, 2)  # general_profile_space
    w.u(0, 1)  # general_tier_flag
    w.u(PROFILE_IDC, 5)
    w.u(1 << (31 - PROFILE_IDC), 32)  # compatibility: own profile bit
    w.u(1, 1)  # general_progressive_source_flag
    w.u(0, 1)  # general_interlaced_source_flag
    w.u(1, 1)  # general_non_packed_constraint_flag
    w.u(1, 1)  # general_frame_only_constraint_flag
    w.u(0, 43)  # reserved zero
    w.u(0, 1)  # general_inbld_flag (reserved)
    w.u(LEVEL_IDC, 8)


def make_vps() -> bytes:
    w = BitWriter()
    w.u(0, 4)  # vps_video_parameter_set_id
    w.u(1, 1)  # vps_base_layer_internal_flag
    w.u(1, 1)  # vps_base_layer_available_flag
    w.u(0, 6)  # vps_max_layers_minus1
    w.u(0, 3)  # vps_max_sub_layers_minus1
    w.u(1, 1)  # vps_temporal_id_nesting_flag
    w.u(0xFFFF, 16)  # vps_reserved_0xffff_16bits
    profile_tier_level(w)
    w.u(0, 1)  # vps_sub_layer_ordering_info_present_flag
    w.ue(0)  # vps_max_dec_pic_buffering_minus1[0]
    w.ue(0)  # vps_max_num_reorder_pics[0]
    w.ue(0)  # vps_max_latency_increase_plus1[0]
    w.u(0, 6)  # vps_max_layer_id
    w.ue(0)  # vps_num_layer_sets_minus1
    w.u(0, 1)  # vps_timing_info_present_flag
    w.u(0, 1)  # vps_extension_flag
    w.rbsp_trailing()
    return nal(32, w.bytes())


def make_sps(width: int, height: int) -> bytes:
    w = BitWriter()
    w.u(0, 4)  # sps_video_parameter_set_id
    w.u(0, 3)  # sps_max_sub_layers_minus1
    w.u(1, 1)  # sps_temporal_id_nesting_flag
    profile_tier_level(w)
    w.ue(0)  # sps_seq_parameter_set_id
    w.ue(1)  # chroma_format_idc (4:2:0)
    w.ue(width)  # pic_width_in_luma_samples
    w.ue(height)  # pic_height_in_luma_samples
    w.u(0, 1)  # conformance_window_flag (dims are min-CB aligned)
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.u(0, 1)  # sps_sub_layer_ordering_info_present_flag
    w.ue(0)  # sps_max_dec_pic_buffering_minus1[0]
    w.ue(0)  # sps_max_num_reorder_pics[0]
    w.ue(0)  # sps_max_latency_increase_plus1[0]
    w.ue(0)  # log2_min_luma_coding_block_size_minus3 (8)
    w.ue(3)  # log2_diff_max_min_luma_coding_block_size (CTB 64)
    w.ue(0)  # log2_min_luma_transform_block_size_minus2 (4)
    w.ue(3)  # log2_diff_max_min_luma_transform_block_size (32)
    w.ue(0)  # max_transform_hierarchy_depth_inter
    w.ue(0)  # max_transform_hierarchy_depth_intra
    w.u(0, 1)  # scaling_list_enabled_flag
    w.u(0, 1)  # amp_enabled_flag
    w.u(0, 1)  # sample_adaptive_offset_enabled_flag
    w.u(0, 1)  # pcm_enabled_flag
    w.ue(0)  # num_short_term_ref_pic_sets
    w.u(0, 1)  # long_term_ref_pics_present_flag
    w.u(0, 1)  # sps_temporal_mvp_enabled_flag
    w.u(0, 1)  # strong_intra_smoothing_enabled_flag
    w.u(0, 1)  # vui_parameters_present_flag
    w.u(0, 1)  # sps_extension_present_flag
    w.rbsp_trailing()
    return nal(33, w.bytes())


def make_pps() -> bytes:
    w = BitWriter()
    w.ue(0)  # pps_pic_parameter_set_id
    w.ue(0)  # pps_seq_parameter_set_id
    w.u(0, 1)  # dependent_slice_segments_enabled_flag
    w.u(0, 1)  # output_flag_present_flag
    w.u(0, 3)  # num_extra_slice_header_bits
    w.u(0, 1)  # sign_data_hiding_enabled_flag
    w.u(0, 1)  # cabac_init_present_flag
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.se(0)  # init_qp_minus26
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # transform_skip_enabled_flag
    w.u(0, 1)  # cu_qp_delta_enabled_flag
    w.se(0)  # pps_cb_qp_offset
    w.se(0)  # pps_cr_qp_offset
    w.u(0, 1)  # pps_slice_chroma_qp_offsets_present_flag
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 1)  # weighted_bipred_flag
    w.u(0, 1)  # transquant_bypass_enabled_flag
    w.u(0, 1)  # tiles_enabled_flag
    w.u(0, 1)  # entropy_coding_sync_enabled_flag
    w.u(1, 1)  # pps_loop_filter_across_slices_enabled_flag
    w.u(0, 1)  # deblocking_filter_control_present_flag
    w.u(0, 1)  # pps_scaling_list_data_present_flag
    w.u(0, 1)  # lists_modification_present_flag
    w.ue(0)  # log2_parallel_merge_level_minus2
    w.u(0, 1)  # slice_segment_header_extension_present_flag
    w.u(0, 1)  # pps_extension_present_flag
    w.rbsp_trailing()
    return nal(34, w.bytes())


def box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def fullbox(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


def make_hvcc(vps: bytes, sps: bytes, pps: bytes) -> bytes:
    rec = bytearray()
    rec.append(1)  # configurationVersion
    rec.append((0 << 6) | (0 << 5) | PROFILE_IDC)  # space/tier/profile_idc
    rec += (1 << (31 - PROFILE_IDC)).to_bytes(4, "big")  # compat flags
    rec += bytes([0b10110000, 0, 0, 0, 0, 0])  # constraint flags (prog+np+fo)
    rec.append(LEVEL_IDC)
    rec += (0xF000).to_bytes(2, "big")  # min_spatial_segmentation_idc
    rec.append(0xFC | 0)  # parallelismType
    rec.append(0xFC | 1)  # chromaFormat 4:2:0
    rec.append(0xF8 | 0)  # bitDepthLumaMinus8
    rec.append(0xF8 | 0)  # bitDepthChromaMinus8
    rec += (0).to_bytes(2, "big")  # avgFrameRate
    rec.append((0 << 6) | (1 << 3) | (1 << 2) | 3)  # cfr/layers/nested/len-1
    rec.append(3)  # numOfArrays
    for nal_type, nalu in ((32, vps), (33, sps), (34, pps)):
        rec.append(0x80 | nal_type)  # array_completeness=1
        rec += (1).to_bytes(2, "big")
        rec += len(nalu).to_bytes(2, "big")
        rec += nalu
    return box(b"hvcC", bytes(rec))


def make_heic(width: int, height: int) -> bytes:
    vps, sps, pps = make_vps(), make_sps(width, height), make_pps()

    # mdat payload: length-prefixed (4-byte, per hvcC lengthSizeMinusOne=3)
    # IDR_W_RADL NAL with a placeholder body — see module docstring.
    slice_body = nal(19, b"\x00" * 32)
    payload = len(slice_body).to_bytes(4, "big") + slice_body

    ftyp = box(b"ftyp", b"heic" + b"\x00\x00\x00\x00" + b"mif1heic")

    hdlr = fullbox(
        b"hdlr", 0, 0,
        b"\x00\x00\x00\x00" + b"pict" + b"\x00" * 12 + b"\x00",
    )
    pitm = fullbox(b"pitm", 0, 0, (1).to_bytes(2, "big"))
    infe = fullbox(
        b"infe", 2, 0,
        (1).to_bytes(2, "big") + (0).to_bytes(2, "big") + b"hvc1" + b"\x00",
    )
    iinf = fullbox(b"iinf", 0, 0, (1).to_bytes(2, "big") + infe)

    ispe = fullbox(
        b"ispe", 0, 0,
        width.to_bytes(4, "big") + height.to_bytes(4, "big"),
    )
    colr = box(b"colr", b"nclx" + struct.pack(">HHHB", 1, 13, 6, 0x80))
    ipco = box(b"ipco", make_hvcc(vps, sps, pps) + ispe + colr)
    # ipma v0 flags 0: item 1 -> [hvcC (essential), ispe, colr]
    ipma = fullbox(
        b"ipma", 0, 0,
        (1).to_bytes(4, "big") + (1).to_bytes(2, "big") + bytes(
            [3, 0x80 | 1, 2, 3]
        ),
    )
    iprp = box(b"iprp", ipco + ipma)

    # iloc with a placeholder extent offset; fixed up after layout.
    def iloc_with(offset: int) -> bytes:
        body = bytes([0x44, 0x00])  # offset_size 4, length_size 4, base 0
        body += (1).to_bytes(2, "big")  # item_count
        body += (1).to_bytes(2, "big")  # item_ID
        body += (0).to_bytes(2, "big")  # data_reference_index
        body += (1).to_bytes(2, "big")  # extent_count
        body += offset.to_bytes(4, "big")
        body += len(payload).to_bytes(4, "big")
        return fullbox(b"iloc", 0, 0, body)

    meta_children = hdlr + pitm + iinf + iprp + iloc_with(0)
    meta = fullbox(b"meta", 0, 0, meta_children)
    mdat_offset = len(ftyp) + len(meta) + 8  # payload starts after mdat hdr
    meta = fullbox(b"meta", 0, 0, hdlr + pitm + iinf + iprp + iloc_with(mdat_offset))
    mdat = box(b"mdat", payload)
    return ftyp + meta + mdat


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "heic",
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "fixture_64x48.heic")
    data = make_heic(64, 48)
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
