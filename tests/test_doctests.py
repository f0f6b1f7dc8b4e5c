"""Doc-as-test discipline: execute every docstring example in the
pure (no-SparkSession) modules, mirroring the reference's
``pytest --doctest-modules`` CI step (reference
cicd/cicd_template.py:108-133). Spark-dependent modules are exercised
by the functional suite instead — their docstrings document plans and
contracts, not REPL transcripts."""

from __future__ import annotations

import doctest

import pytest

import mssql_dataframe_spark.conversion_rules as conversion_rules
import mssql_dataframe_spark.errors as errors
import mssql_dataframe_spark.identifiers as identifiers
import mssql_dataframe_spark.jdbc as jdbc

PURE_MODULES = [identifiers, conversion_rules, errors, jdbc]


@pytest.mark.parametrize("mod", PURE_MODULES, ids=lambda m: m.__name__)
def test_module_doctests_pass(mod):
    results = doctest.testmod(mod, verbose=False)
    assert results.failed == 0


def test_doctest_examples_exist():
    """The discipline is only real if examples exist to run."""
    total = sum(
        doctest.testmod(mod, verbose=False).attempted
        for mod in PURE_MODULES
    )
    assert total >= 10
