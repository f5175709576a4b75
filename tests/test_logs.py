"""Log front-end parity tests (SURVEY.md S1/M1/M2): exact reference
semantics on hand-built lines, including malformed-row flagging."""

from __future__ import annotations

import pyarrow as pa

from anomalydetection_ray.sources.logs import (
    FIELDS,
    enrich_structure_batch,
    mask_template_batch,
    parse_label_batch,
)


def test_parse_label_semantics():
    batch = pa.table(
        {
            "text": [
                "- normal line content here",
                "ALARM something bad happened",
                "-",            # no payload -> dropped (models/drain.py:17-20)
                "2005 label-less? no: token0 != '-' means anomaly",
                None,           # null line -> dropped
            ]
        }
    )
    out = parse_label_batch(batch)
    assert out["label"].to_pylist() == [0, 1, 1]
    assert out["log"].to_pylist()[0] == "normal line content here"
    assert out["log"].to_pylist()[1] == "something bad happened"


def test_enrich_structure_well_formed():
    log = "1136999 2005.06.03 R02-M1-N0 15.42.50 R02-M1-N0 RAS KERNEL INFO generating core file 123"
    out = enrich_structure_batch(pa.table({"log": [log]}))
    row = {f: out[f][0].as_py() for f in FIELDS}
    assert row["Timestamp"] == "1136999"
    assert row["Date"] == "2005.06.03"
    assert row["Node"] == "R02-M1-N0"
    assert row["Type"] == "RAS"
    assert row["Component"] == "KERNEL"
    assert row["Level"] == "INFO"
    assert out["Content"][0].as_py() == "generating core file 123"
    assert out["malformed"][0].as_py() is False


def test_enrich_structure_malformed_flagged():
    out = enrich_structure_batch(pa.table({"log": ["too few tokens", ""]}))
    assert out["malformed"].to_pylist() == [True, True]
    for f in FIELDS:
        assert out[f].to_pylist() == ["", ""]
    assert out["Content"].to_pylist() == ["", ""]


def test_enrich_whitespace_normalization():
    log = "a b c d e f g h   multi   space\ttab  content"
    out = enrich_structure_batch(pa.table({"log": [log]}))
    assert out["Content"][0].as_py() == "multi space tab content"


def test_mask_template():
    out = mask_template_batch(
        pa.table({"Content": ["core file 123 at 0x4a", "core file 99 at 0x4a", "no digits"]})
    )
    tpl = out["template"].to_pylist()
    assert tpl[0] == tpl[1] == "core file <*> at <*>x<*>a"
    assert tpl[2] == "no digits"


def test_parse_label_strips_leading_whitespace():
    """Reference parity (models/drain.py:17 strips before splitting): a
    leading-space '-' line is NORMAL, not an empty-token-0 anomaly."""
    batch = pa.table({"text": ["   - indented normal line", "\t- tabbed normal", "  ALARM bad"]})
    out = parse_label_batch(batch)
    assert out["label"].to_pylist() == [0, 0, 1]
    assert out["log"].to_pylist() == ["indented normal line", "tabbed normal", "bad"]
