"""Parser robustness fuzzing: arbitrary input must either parse or
raise a typed ParserError — never an unclassified exception (the
unique-error-condition mandate, SPEC.md:27-37). Plus a generator of
structurally valid schemata that must always parse AND build."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from medea_ps_spark import errors as E
from medea_ps_spark.plans.medea.analysis import compile_schemata
from medea_ps_spark.plans.medea.parser import parse_specification

FUZZ_SETTINGS = settings(
    max_examples=300, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.filter_too_much],
)

MEDEA_WORDS = [
    "$schema", "$type", "$string-values", "$properties", "$property-name",
    "$property-schema", "$optional-property", "$min-length", "$max-length",
    "$element-type", "$tuple", "$additional-properties-allowed",
    "$additional-property-schema", "$string", "$number", "$null",
    "$boolean", "$array", "$object", "$start", "foo", "bar", '"quoted"',
    "42", "0", "003",
]


@given(
    st.lists(
        st.tuples(
            st.sampled_from([0, 1, 3, 4, 8, 9]),
            st.lists(st.sampled_from(MEDEA_WORDS), min_size=0, max_size=3),
        ),
        min_size=0,
        max_size=12,
    )
)
@FUZZ_SETTINGS
def test_structured_fuzz_never_unclassified(lines):
    text = "\n".join(" " * ind + " ".join(words) for ind, words in lines)
    try:
        specs = parse_specification(text)
        try:
            compile_schemata(specs)
        except E.SchemaError:
            pass
    except E.ParserError:
        pass  # the only acceptable failure class for parse-stage input


@given(st.text(max_size=200))
@FUZZ_SETTINGS
def test_arbitrary_text_never_unclassified(text):
    try:
        parse_specification(text)
    except E.ParserError:
        pass


@given(st.binary(max_size=100))
@FUZZ_SETTINGS
def test_arbitrary_bytes_never_unclassified(data):
    try:
        parse_specification(data)
    except E.ParserError:  # includes NotUtf8
        pass


def gen_valid_schema(rng: random.Random) -> str:
    """Structurally valid random schema graph: $start + helpers with
    consistent types/specs and no dangling refs or cycles."""
    helpers = [f"s{i}" for i in range(rng.randint(0, 3))]
    names = ["$start"] + helpers
    chunks = []
    for i, name in enumerate(names):
        lines = [f"$schema {name}"]
        later = names[i + 1:]
        kind = rng.choice(["any", "prim", "enum", "list", "tuple", "obj", "ref"])
        if kind == "ref" and later:
            lines += ["    $type", f"        {rng.choice(later)}"]
        elif kind == "prim":
            lines += ["    $type", f"        ${rng.choice(['string','number','boolean','null'])}"]
        elif kind == "enum":
            lines += ["    $type", "        $string", "    $string-values"]
            for v in rng.sample(["a", "b", "c", "d"], k=rng.randint(1, 3)):
                lines.append(f'        "{v}"')
        elif kind == "list":
            lo = rng.randint(1, 3)
            lines += ["    $type", "        $array",
                      f"    $min-length {lo}", f"    $max-length {lo + rng.randint(0, 4)}"]
            if later and rng.random() < 0.5:
                lines += ["    $element-type", f"        {rng.choice(later)}"]
        elif kind == "tuple":
            lines += ["    $type", "        $array", "    $tuple"]
            for _ in range(rng.randint(0, 3)):
                lines.append(
                    f"        {rng.choice(later) if later and rng.random() < 0.3 else '$number'}"
                )
        elif kind == "obj":
            lines += ["    $type", "        $object", "    $properties"]
            for p in rng.sample(["p1", "p2", "p3"], k=rng.randint(0, 2)):
                lines.append(f'        $property-name "{p}"')
                if later and rng.random() < 0.5:
                    lines.append(f"        $property-schema {rng.choice(later)}")
                if rng.random() < 0.3:
                    lines.append("        $optional-property")
            if rng.random() < 0.4:
                lines.append("        $additional-properties-allowed")
        chunks.append("\n".join(lines))
    return "\n\n".join(chunks) + "\n"


def test_generated_valid_schemata_roundtrip():
    ok = 0
    for seed in range(200):
        rng = random.Random(seed)
        text = gen_valid_schema(rng)
        specs = parse_specification(text)  # must parse
        try:
            m = compile_schemata(specs)
            assert "$start" in m
            ok += 1
        except E.IsolatedSchemata:
            pass  # generator may leave an unreferenced helper — legal reject
    assert ok > 50  # plenty build fully
