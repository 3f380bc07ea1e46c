"""Known-answer + round-trip tests for the pure-numpy codecs
(operators/codecs.py): BMP, WAV, EDF, Y4M. Each decoder is checked
against hand-assembled bytes (so the parser is pinned to the public
spec, not to our own encoder) AND against encode→decode round trips
over adversarial shapes (odd widths → row padding, top-down rows,
multi-chunk WAVs, multi-signal EDF records)."""

import struct

import numpy as np
import pytest

from data_ingestor_and_features_creator_spark.operators import codecs


# ---------------------------------------------------------------- BMP

def test_bmp_hand_assembled_2x2_24bit():
    # 2x2 24-bit BMP, bottom-up, rows padded 6 -> 8 bytes.
    # pixel values (B=G=R): top row [10, 20], bottom row [30, 40]
    rows_bottom_up = (
        bytes([30] * 3 + [40] * 3) + b"\x00\x00"
        + bytes([10] * 3 + [20] * 3) + b"\x00\x00")
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                       len(rows_bottom_up), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(rows_bottom_up), 0, 0, 54)
    img = codecs.decode_bmp(hdr + info + rows_bottom_up)
    assert img.tolist() == [[10, 20], [30, 40]]


def test_bmp_top_down_negative_height():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = codecs.encode_bmp(img, top_down=True)
    assert struct.unpack_from("<i", b, 22)[0] == -3
    assert np.array_equal(codecs.decode_bmp(b), img)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 5), (25, 7), (33, 9)])
@pytest.mark.parametrize("bpp", [8, 24])
def test_bmp_roundtrip_odd_widths(w, h, bpp):
    rng = np.random.RandomState(w * 100 + h + bpp)
    img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img, bpp=bpp)),
                          img)


def test_bmp_color_luma_is_bt601_integer():
    # one pure-red pixel: B=0 G=0 R=255 -> (299*255)//1000 = 76
    row = bytes([0, 0, 255]) + b"\x00"
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 58, 0, 0, 54)
    assert codecs.decode_bmp(hdr + info + row)[0, 0] == 76


def test_bmp_rejects_compressed_and_truncated():
    img = np.zeros((2, 2), dtype=np.uint8)
    good = bytearray(codecs.encode_bmp(img))
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(bad))
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(good[:-4]))


# ---------------------------------------------------------------- WAV

def test_wav_hand_assembled_with_extra_chunk():
    # fmt, then a LIST chunk (odd size -> pad byte), then data.
    pcm = struct.pack("<4h", 100, -200, 300, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    listc = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + listc + b"data" + struct.pack("<I", len(pcm)) + pcm)
    rate, ch, samples = codecs.decode_wav(
        b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (rate, ch) == (8000, 1)
    assert samples.tolist() == [100, -200, 300, -32768]


def test_wav_roundtrip_stereo():
    rng = np.random.RandomState(7)
    pcm = rng.randint(-32768, 32767, size=(50, 2)).astype("<i2")
    rate, ch, out = codecs.decode_wav(codecs.encode_wav(44100, pcm, 2))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, pcm.reshape(-1))


def test_wav_rejects_non_pcm():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# ---------------------------------------------------------------- EDF

def test_edf_roundtrip_two_signals():
    ecg = np.arange(-512, 512, dtype=np.int16)       # 1024 = 8 rec x 128
    resp = np.repeat(np.arange(8, dtype=np.int16), 16)  # spr 16
    b = codecs.encode_edf([("ECG I", 128, ecg), ("RESP", 16, resp)],
                          record_duration_s=1)
    out = codecs.decode_edf(b)
    assert out["n_records"] == 8
    labels = [s["label"] for s in out["signals"]]
    assert labels == ["ECG I", "RESP"]
    assert out["signals"][0]["fs_hz"] == 128.0
    assert np.array_equal(out["signals"][0]["digital"], ecg)
    assert np.array_equal(out["signals"][1]["digital"], resp)


def test_edf_physical_calibration():
    # phys [-5, 5] over dig [-32768, 32767]: dig 0 maps near 0.0
    sig = np.array([-32768, 0, 32767], dtype=np.int16)
    b = codecs.encode_edf([("C", 3, sig)])
    phys = codecs.decode_edf(b)["signals"][0]["physical"]
    assert phys[0] == pytest.approx(-5.0)
    assert phys[2] == pytest.approx(5.0)
    assert abs(phys[1]) < 1e-3


def test_edf_header_is_ascii_fixed_width():
    b = codecs.encode_edf([("ECG", 4, np.zeros(8, dtype=np.int16))])
    assert b[:8] == b"0       "
    assert int(b[184:192].decode().strip()) == 512  # 256 * (1 + 1 signal)
    b.decode; b[:512].decode("ascii")  # header must be pure ASCII


def test_edf_rejects_non_edf():
    with pytest.raises(ValueError):
        codecs.decode_edf(b"RIFF" + b"\x00" * 300)


# ---------------------------------------------------------------- Y4M

def test_y4m_hand_assembled_mono():
    y = bytes(range(6))  # 3x2
    raw = b"YUV4MPEG2 W3 H2 F30:1 Cmono\nFRAME\n" + y + b"FRAME\n" + y
    out = codecs.decode_y4m(raw)
    assert (out["width"], out["height"]) == (3, 2)
    assert (out["fps_num"], out["fps_den"]) == (30, 1)
    assert len(out["frames"]) == 2
    assert out["frames"][0].tolist() == [[0, 1, 2], [3, 4, 5]]


def test_y4m_roundtrip_420():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, size=(24, 32), dtype=np.uint8)
              for _ in range(5)]
    out = codecs.decode_y4m(codecs.encode_y4m(frames, fps_num=24))
    assert out["chroma"] == "420jpeg"
    assert len(out["frames"]) == 5
    for a, b in zip(frames, out["frames"]):
        assert np.array_equal(a, b)


def test_y4m_rejects_truncated_frame():
    frames = [np.zeros((4, 4), dtype=np.uint8)]
    b = codecs.encode_y4m(frames)
    with pytest.raises(ValueError):
        codecs.decode_y4m(b[:-3])


# ---------------------------------------------------------- sniffing

def test_sniff_modality_dispatch():
    img = codecs.encode_bmp(np.zeros((2, 2), dtype=np.uint8))
    wav = codecs.encode_wav(8000, np.zeros(4, dtype=np.int16))
    y4m = codecs.encode_y4m([np.zeros((2, 2), dtype=np.uint8)])
    edf = codecs.encode_edf([("E", 2, np.zeros(4, dtype=np.int16))])
    assert codecs.sniff_modality(img) == "image/bmp"
    assert codecs.sniff_modality(wav) == "audio/wav"
    assert codecs.sniff_modality(y4m) == "video/y4m"
    assert codecs.sniff_modality(edf) == "signal/edf"
    assert codecs.sniff_modality(b"hello") == "application/octet-stream"
