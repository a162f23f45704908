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


@pytest.mark.skipif(not os.path.isdir(_SF_DIR), reason="driver testdata absent")
def test_approx_distinct_within_error_bound(spark):
    """The one registry entry with no cross-engine oracle (HLL sketches
    differ per engine) carries a falsifiable claim instead:
    |estimate − exact| / exact < 3·rsd, with rsd = 0.05 (the
    approx_count_distinct default). HLL++ at that precision stays
    within 3 standard errors for any input; a broken sketch or a
    column mix-up blows the bound immediately (VERDICT r4 item 3)."""
    entry = _entry()
    row = entry.queries()["approx_distinct_users"](spark, _SF_DIR).collect()[0]
    exact = row["exact_users"]
    assert exact > 0
    rel_err = abs(row["approx_users"] - exact) / exact
    assert rel_err < 3 * 0.05, (
        f"approx_count_distinct estimate {row['approx_users']} vs exact "
        f"{exact}: relative error {rel_err:.4f} exceeds the 3·rsd bound"
    )
