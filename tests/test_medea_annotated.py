"""Annotated-tree output parity (ValidatedJSON ≙ Cofree annotations,
/root/reference/src/Data/Medea.purs:68-106): verdicts must agree with
the plain validator on every conformance fixture, and annotations must
carry the right schema tags."""

from __future__ import annotations

import glob
import json
import random

import pytest

from medea_ps_spark.plans.medea.analysis import load_schema_from_file
from medea_ps_spark.plans.medea.validate import validate, validate_annotated
from tests.test_medea_validator import TARGETED, gen_json

CONF = "/root/reference/conformance/validation"


@pytest.mark.parametrize(
    "path", sorted(glob.glob(f"{CONF}/*.medea")), ids=lambda p: p.split("/")[-1]
)
def test_annotated_agrees_with_plain(path):
    schema = load_schema_from_file(path)
    rng = random.Random(7)
    docs = [gen_json(rng) for _ in range(120)] + TARGETED
    for v in docs:
        doc = json.dumps(v)
        ok, err, _ = validate(schema, doc)
        tree, err2 = validate_annotated(schema, doc)
        assert (tree is not None) == ok, (path, doc)
        if not ok:
            assert err2 == err


def test_annotation_tags():
    schema = load_schema_from_file(f"{CONF}/2-tuple.medea")
    tree, err = validate_annotated(schema, '[{"x": 1}, "s"]')
    assert err is None
    # root re-tagged by the outermost custom ($start), per the
    # reference's `$>` over the whole Cofree
    assert tree["schema"] == "UserDefined:$start"
    assert isinstance(tree["value"], list) and len(tree["value"]) == 2


def test_annotation_prim_children():
    schema = load_schema_from_file(f"{CONF}/list-6.medea")
    tree, err = validate_annotated(schema, "[null, true]")
    assert err is None
    kids = tree["value"]
    # `$>` over a Cofree maps EVERY annotation (Medea.purs:330-333), so
    # the outermost custom schema re-tags the whole tree — including
    # children — exactly as the reference does
    assert [k["schema"] for k in kids] == [
        "UserDefined:$start", "UserDefined:$start",
    ]
    assert [k["value"] for k in kids] == [None, True]
    bad, err = validate_annotated(schema, '[null, "nope"]')
    assert bad is None and err == "NotOneOfOptions"
