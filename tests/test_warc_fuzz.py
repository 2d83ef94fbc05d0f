"""Property fuzz for the WARC parser's tolerant-mode contract:

1. NO input bytes — random garbage, bit-flipped real archives, truncations
   at every byte — may raise out of parse_warc_file in tolerant mode; the
   contract is error ROWS, never exceptions (a CC-scale job must survive
   any corrupt file).
2. Roundtrip: any record stream built by the independent muxer parses
   back field-identical.
3. Prefix preservation: truncating an archive never loses the records
   that fully precede the cut.
"""

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from bayard_spark.sources.warc import parse_warc_file

HDR_VAL = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=30,
)


def mux(headers: dict, payload: bytes) -> bytes:
    lines = ["WARC/1.0"]
    lines += [f"{k}: {v}" for k, v in headers.items()]
    lines += [f"Content-Length: {len(payload)}"]
    return (
        ("\r\n".join(lines)).encode("latin-1") + b"\r\n\r\n" + payload + b"\r\n\r\n"
    )


record_st = st.builds(
    mux,
    st.fixed_dictionaries(
        {"WARC-Type": st.sampled_from(["response", "conversion", "resource"])},
        optional={
            "WARC-Target-URI": HDR_VAL,
            "WARC-Date": st.sampled_from(
                ["2024-03-05T12:34:56Z", "not-a-date", ""]
            ),
            "Content-Type": st.sampled_from(
                ["text/plain", "application/http; msgtype=response", ""]
            ),
        },
    ),
    st.binary(max_size=200),
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_garbage_never_raises(raw):
    recs = parse_warc_file(raw, "fuzz")
    assert isinstance(recs, list)
    for r in recs:
        assert r["parse_error"] is None or isinstance(r["parse_error"], str)


@settings(max_examples=100, deadline=None)
@given(st.lists(record_st, min_size=1, max_size=5), st.booleans())
def test_roundtrip_field_identity(records, gz):
    raw = b"".join(records)
    if gz:
        raw = gzip.compress(raw)
    recs = parse_warc_file(raw, "f")
    assert len(recs) == len(records)
    assert all(r["parse_error"] is None for r in recs)
    assert [r["record_seq"] for r in recs] == list(range(len(records)))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(record_st, min_size=1, max_size=4),
    st.integers(min_value=0, max_value=10_000),
)
def test_truncation_keeps_prefix_and_never_raises(records, cut):
    raw = b"".join(records)
    cut = min(cut, len(raw))
    recs = parse_warc_file(raw[:cut], "f")
    # records that fully precede the cut must survive intact
    off = 0
    expect = 0
    for r in records:
        off += len(r)
        if off <= cut:
            expect += 1
    good = [r for r in recs if r["parse_error"] is None]
    assert len(good) >= expect
    for i, r in enumerate(good[:expect]):
        assert r["record_seq"] == i


@settings(max_examples=150, deadline=None)
@given(
    st.lists(record_st, min_size=1, max_size=3),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=0, max_value=255),
    st.booleans(),
)
def test_bitflip_never_raises(records, pos, val, gz):
    raw = b"".join(records)
    if gz:
        raw = gzip.compress(raw)
    pos = pos % len(raw)
    mutated = raw[:pos] + bytes([val]) + raw[pos + 1 :]
    recs = parse_warc_file(mutated, "f")
    assert isinstance(recs, list)
