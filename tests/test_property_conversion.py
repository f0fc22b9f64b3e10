"""Property-based differential test for the conversion surface.

Hypothesis generates random (XSD, XML) document pairs over the construct
space the reference supports (SURVEY.md §1.3-1.4: scalar types, optional
elements, attributes, a repeated complex child); an independent Python
model computes the expected reference-shaped output (attr-first `elem@attr`
naming, decimal→float, date→formatted string, empty→null, root wrapping),
and the Spark pipeline must match it document-for-document.

This is the regression net for the shaping rules no single golden file
exercises in combination.
"""

from __future__ import annotations

import datetime
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xml_to_parquet_spark import read_xml_documents

NAMES = st.from_regex(r"[a-z][a-z0-9]{2,7}", fullmatch=True)
XSD_TYPES = ["string", "integer", "decimal", "boolean", "date"]

scalar_value = {
    "string": st.from_regex(r"[A-Za-z0-9][A-Za-z0-9 ]{0,18}[A-Za-z0-9]", fullmatch=True),
    "integer": st.integers(min_value=-(2**31), max_value=2**31),
    "decimal": st.integers(min_value=-(10**6), max_value=10**6).map(
        lambda c: c / 100  # cents → exact-ish double, stable text round-trip
    ),
    "boolean": st.booleans(),
    "date": st.dates(
        min_value=datetime.date(1970, 1, 1), max_value=datetime.date(2030, 12, 31)
    ),
}


@st.composite
def documents(draw):
    """A document spec: root name, scalar fields (name, type, value-or-None),
    optional root attribute, and a repeated complex child."""
    names = draw(
        st.lists(NAMES, min_size=4, max_size=8, unique=True)
    )
    root, item_name, attr_name = names[0], names[1], names[2]
    field_names = names[3:]
    fields = []
    for fn in field_names:
        ftype = draw(st.sampled_from(XSD_TYPES))
        present = draw(st.booleans())
        value = draw(scalar_value[ftype]) if present else None
        fields.append((fn, ftype, value))
    attr_value = draw(st.one_of(st.none(), scalar_value["string"]))
    n_items = draw(st.integers(min_value=0, max_value=3))
    items = [draw(scalar_value["integer"]) for _ in range(n_items)]
    return root, attr_name, attr_value, fields, item_name, items


def _xml_scalar(ftype, value) -> str:
    if ftype == "boolean":
        return "true" if value else "false"
    if ftype == "date":
        return value.isoformat()
    if ftype == "decimal":
        return repr(value)
    return str(value)


def _expected_scalar(ftype, value):
    """The reference's decode + json_decoder coercion (SURVEY.md §1.3)."""
    if value is None:
        return None
    if ftype == "date":
        return f"{value.isoformat()} 00:00:00.000"
    if ftype == "decimal":
        return float(value)
    return value


def _build(root, attr_name, attr_value, fields, item_name, items):
    xsd_fields = "".join(
        f'<xs:element name="{fn}" type="xs:{ft}" minOccurs="0"/>' for fn, ft, _ in fields
    )
    xsd = f"""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="{root}">
    <xs:complexType>
      <xs:sequence>
        {xsd_fields}
        <xs:element name="{item_name}" minOccurs="0" maxOccurs="unbounded">
          <xs:complexType><xs:sequence>
            <xs:element name="val" type="xs:integer"/>
          </xs:sequence></xs:complexType>
        </xs:element>
      </xs:sequence>
      <xs:attribute name="{attr_name}" type="xs:string"/>
    </xs:complexType>
  </xs:element>
</xs:schema>"""

    attr = f' {attr_name}="{attr_value}"' if attr_value is not None else ""
    body = "".join(
        f"<{fn}>{_xml_scalar(ft, v)}</{fn}>" for fn, ft, v in fields if v is not None
    )
    body += "".join(f"<{item_name}><val>{v}</val></{item_name}>" for v in items)
    xml = f"<?xml version='1.0'?><{root}{attr}>{body}</{root}>"

    expected_root = {f"{root}@{attr_name}": attr_value}
    for fn, ft, v in fields:
        expected_root[fn] = _expected_scalar(ft, v)
    expected_root[item_name] = [{"val": v} for v in items] if items else None
    return xsd, xml, {root: expected_root}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(documents())
def test_random_document_matches_reference_model(spark, tmp_path_factory, spec):
    root, attr_name, attr_value, fields, item_name, items = spec
    xsd, xml, expected = _build(root, attr_name, attr_value, fields, item_name, items)
    d = tmp_path_factory.mktemp("prop")
    (d / "doc.xml").write_text(xml)
    (d / "s.xsd").write_text(xsd)
    df = read_xml_documents(spark, str(d / "doc.xml"), str(d / "s.xsd"))
    got = json.loads(
        df.select(
            F.to_json(F.struct("*"), {"ignoreNullFields": "false"}).alias("j")
        ).collect()[0]["j"]
    )
    assert got == expected
