"""Registry-wide driver-compatibility contract: no complex column types.

The external driver canonicalizes every query result in pandas with
``sort_values`` over all columns; array/map/struct cells are unhashable
there and crash the sweep (this shipped as r3's one red row,
``multimodal_features``). Every ``queries()`` entry must therefore
project to scalar columns only — arrays stay in the library APIs.

Schema access triggers Catalyst analysis only (no job run), so this
sweeps all ~60 registry entries cheaply at sf0.001.
"""

import importlib.util
import os

import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

_ENTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "__spark_entry__.py",
)
_SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def _entry():
    spec = importlib.util.spec_from_file_location("entry_schema_test", _ENTRY_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isdir(_SF_DIR), reason="driver testdata absent")
def test_no_query_returns_complex_typed_columns(spark):
    entry = _entry()
    offenders = {}
    for name, fn in entry.queries().items():
        schema = fn(spark, _SF_DIR).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries() entries return driver-unsortable complex columns "
        f"(project to scalars): {offenders}"
    )
