"""audio_metadata / mp3 header parsing / decode_audio dispatch.

The mp3 frames below are built by an independent generator (its own header
bit packing from the public ISO 11172-3 tables) — parser and generator are
two separate table transcriptions, so agreement is meaningful.
"""

import struct

import numpy as np
import pytest

from bayard_spark.functions.multimodal import (
    MediaDecodeUnavailable,
    audio_metadata,
    decode_audio,
    mp3_metadata,
    wav_info,
)
from tests.test_flac_decode import _sig, encode_flac


# ------------------------------------------------- independent mp3 builder

V_BITS = {"1": 3, "2": 2, "2.5": 0}
L_BITS = {1: 3, 2: 2, 3: 1}
BR_TABLE = {
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
SR_TABLE = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
            "2.5": [11025, 12000, 8000]}


def mp3_frame(version="1", layer=3, bitrate=128, rate=44100, mono=False,
              pad=0, body=None) -> bytes:
    vg = "1" if version == "1" else "2"
    br_idx = BR_TABLE[(vg, layer)].index(bitrate) + 1
    sr_idx = SR_TABLE[version].index(rate)
    hdr = (0x7FF << 21) | (V_BITS[version] << 19) | (L_BITS[layer] << 17)
    hdr |= 1 << 16  # CRC absent
    hdr |= (br_idx << 12) | (sr_idx << 10) | (pad << 9)
    hdr |= (3 if mono else 0) << 6
    if layer == 1:
        flen = (12 * bitrate * 1000 // rate + pad) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        flen = (spf // 8) * bitrate * 1000 // rate + pad
    frame = bytearray(struct.pack(">I", hdr))
    frame += body if body is not None else bytes((flen - 4) * [0x55])
    assert len(frame) == flen
    return bytes(frame)


def mp3_file(n_frames=20, **kw) -> bytes:
    return b"".join(mp3_frame(**kw) for _ in range(n_frames))


class TestMp3Metadata:
    def test_cbr_v1_l3(self):
        data = mp3_file(30, version="1", layer=3, bitrate=128, rate=44100)
        m = mp3_metadata(data)
        assert (m["version"], m["layer"]) == ("1", 3)
        assert m["sample_rate"] == 44100 and m["n_channels"] == 2
        assert m["bitrate_kbps"] == 128 and not m["vbr"]
        assert m["n_frames"] == 30 and m["samples_per_frame"] == 1152
        assert m["duration_s"] == pytest.approx(30 * 417 * 8 / 128000)

    def test_layer2_and_v2_and_mono(self):
        m = mp3_metadata(mp3_file(10, version="1", layer=2, bitrate=192))
        assert m["layer"] == 2 and m["samples_per_frame"] == 1152
        m = mp3_metadata(
            mp3_file(10, version="2", layer=3, bitrate=64, rate=22050,
                     mono=True)
        )
        assert m["version"] == "2" and m["sample_rate"] == 22050
        assert m["n_channels"] == 1 and m["samples_per_frame"] == 576
        m = mp3_metadata(
            mp3_file(10, version="2.5", layer=3, bitrate=40, rate=8000)
        )
        assert m["version"] == "2.5" and m["sample_rate"] == 8000

    def test_layer1(self):
        m = mp3_metadata(mp3_file(8, version="1", layer=1, bitrate=384,
                                  rate=48000))
        assert m["layer"] == 1 and m["samples_per_frame"] == 384

    def test_xing_vbr_frame_count(self):
        # Xing tag sits after the layer-III side info (32 bytes, V1 stereo)
        body = bytearray(413 * [0])
        body[32:36] = b"Xing"
        body[36:40] = struct.pack(">I", 1)  # flags: frames present
        body[40:44] = struct.pack(">I", 777)
        first = mp3_frame(bitrate=128, body=bytes(body))
        data = first + mp3_file(5, bitrate=128)
        m = mp3_metadata(data)
        assert m["vbr"] and m["n_frames"] == 777
        assert m["duration_s"] == pytest.approx(777 * 1152 / 44100)

    def test_id3v2_skip_and_id3v1_trailer(self):
        tag_body = b"\x00" * 200
        id3v2 = b"ID3\x04\x00\x00" + bytes(
            [0, 0, (200 >> 7) & 0x7F, 200 & 0x7F]
        ) + tag_body
        frames = mp3_file(12, bitrate=160)
        id3v1 = b"TAG" + b"\x00" * 125
        m = mp3_metadata(id3v2 + frames + id3v1)
        assert m["n_frames"] == 12 and m["bitrate_kbps"] == 160

    def test_false_sync_rejected(self):
        # 0xFF garbage that never has a valid consecutive frame
        junk = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x12" * 50
        with pytest.raises(MediaDecodeUnavailable):
            mp3_metadata(junk)
        # but real frames AFTER leading garbage are found
        data = b"\x00\xffgarbage!" + mp3_file(6, bitrate=96)
        assert mp3_metadata(data)["n_frames"] == 6

    def test_not_audio(self):
        with pytest.raises(MediaDecodeUnavailable):
            mp3_metadata(b"\x89PNG\r\n\x1a\n" + b"\x00" * 60)


class TestWavInfoAndDispatch:
    def _wav(self, n=1000, rate=8000, ch=2, bits=16):
        body = np.zeros(n * ch, dtype="<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                          ch * bits // 8, bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_wav_info(self):
        rate, ch, bits, n_frames, byterate = wav_info(self._wav())
        assert (rate, ch, bits, n_frames) == (8000, 2, 16, 1000)
        assert byterate == 8000 * 2 * 2

    def test_decode_audio_dispatch(self):
        s = _sig(400, 16, 21)
        flac = encode_flac(s, 16000, 16, 200)
        got, rate = decode_audio(flac)
        assert rate == 16000
        np.testing.assert_array_equal(got * (1 << 15), s.astype(np.float64))
        wav_got, wav_rate = decode_audio(self._wav())
        assert wav_rate == 8000 and wav_got.shape == (1000, 2)
        with pytest.raises(MediaDecodeUnavailable):
            decode_audio(mp3_file(3))

    def test_audio_metadata_spark(self, spark):
        rows = [
            (1, self._wav()),
            (2, encode_flac(_sig(300, 16, 22, ch=2), 44100, 16, 150)),
            (3, mp3_file(25, bitrate=128)),
        ]
        df = spark.createDataFrame(rows, "asset_id long, media binary")
        out = {r["asset_id"]: r for r in audio_metadata(df).collect()}
        assert out[1]["container"] == "wav" and out[1]["n_samples"] == 1000
        assert out[1]["duration_s"] == pytest.approx(1000 / 8000)
        assert out[2]["container"] == "flac"
        assert out[2]["sample_rate"] == 44100 and out[2]["n_samples"] == 300
        assert out[2]["n_channels"] == 2 and out[2]["bits"] == 16
        assert out[3]["container"] == "mp3"
        assert out[3]["n_samples"] == 25 * 1152
        assert out[3]["bitrate_kbps"] == 128 and out[3]["vbr"] is False

    def test_audio_features_flac_spark(self, spark):
        from bayard_spark.functions.multimodal import audio_features

        flac = encode_flac(_sig(2000, 16, 23), 8000, 16, 500)
        df = spark.createDataFrame([(7, flac)], "asset_id long, media binary")
        row = audio_features(df).collect()[0]
        assert row["sample_rate"] == 8000 and row["n_samples"] == 2000
        assert len(row["feature"]) == 64


class TestOggMetadata:
    """Independent Ogg page builder (RFC 3533 layout packed by hand)."""

    @staticmethod
    def _page(payload, granule, bos=False, eos=False, seq=0):
        import struct as st

        htype = (2 if bos else 0) | (4 if eos else 0)
        segs = []
        rest = len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        hdr = b"OggS" + bytes([0, htype]) + st.pack("<q", granule)
        hdr += st.pack("<I", 1) + st.pack("<I", seq) + st.pack("<I", 0)
        hdr += bytes([len(segs)]) + bytes(segs)
        return hdr + payload

    def _vorbis(self, rate=44100, ch=2, nominal=112000, granule=441000):
        import struct as st

        ident = (b"\x01vorbis" + st.pack("<I", 0) + bytes([ch])
                 + st.pack("<I", rate) + st.pack("<i", 0)
                 + st.pack("<i", nominal) + st.pack("<i", 0)
                 + b"\xb8\x01")
        return (self._page(ident, 0, bos=True)
                + self._page(b"\x00" * 300, granule // 2, seq=1)
                + self._page(b"\x00" * 300, granule, eos=True, seq=2))

    def test_vorbis(self):
        from bayard_spark.functions.multimodal import ogg_metadata

        m = ogg_metadata(self._vorbis())
        assert m["codec"] == "vorbis" and m["sample_rate"] == 44100
        assert m["n_channels"] == 2 and m["bitrate_kbps"] == 112
        assert m["duration_s"] == pytest.approx(10.0)

    def test_opus(self):
        import struct as st

        from bayard_spark.functions.multimodal import ogg_metadata

        ident = (b"OpusHead" + bytes([1, 2]) + st.pack("<H", 312)
                 + st.pack("<I", 48000) + st.pack("<h", 0) + bytes([0]))
        data = (self._page(ident, 0, bos=True)
                + self._page(b"\x00" * 100, 48000 * 3 + 312, eos=True, seq=1))
        m = ogg_metadata(data)
        assert m["codec"] == "opus" and m["n_channels"] == 2
        assert m["duration_s"] == pytest.approx(3.0)

    def test_malformed(self):
        from bayard_spark.functions.multimodal import ogg_metadata

        with pytest.raises(MediaDecodeUnavailable):
            ogg_metadata(b"NotOgg" + b"\x00" * 40)
        with pytest.raises(MediaDecodeUnavailable):
            ogg_metadata(self._vorbis()[:-100])  # truncated payload
        theora = self._page(b"\x80theora" + b"\x00" * 20, 0, bos=True)
        with pytest.raises(MediaDecodeUnavailable):
            ogg_metadata(theora)

    def test_audio_metadata_ogg_spark(self, spark):
        df = spark.createDataFrame(
            [(1, self._vorbis())], "asset_id long, media binary"
        )
        row = audio_metadata(df).collect()[0]
        assert row["container"] == "ogg:vorbis"
        assert row["duration_s"] == pytest.approx(10.0)
        assert row["bitrate_kbps"] == 112
