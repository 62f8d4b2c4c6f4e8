"""Error-path + validation tests — mirror of the reference's
synth-time precondition tests (test/dynamodb-zero-etl-s3tables.test.ts
:172-200: exact-message throws for missing tableName / PITR)."""

import pytest

from dynamodb_zero_etl_s3tables_spark.spec import (
    SourceSpec,
    TableSpec,
    sanitize_identifier,
)


def test_source_requires_explicit_name():
    # A1 (reference ts:57-61, tested test.ts:172-185)
    with pytest.raises(ValueError, match="explicit tableName"):
        SourceSpec(table_name=None, key_columns=("pk",)).validate()
    with pytest.raises(ValueError, match="explicit tableName"):
        SourceSpec(table_name="  ", key_columns=("pk",)).validate()


def test_source_requires_pitr():
    # A2 (reference ts:63-66, tested test.ts:187-200)
    with pytest.raises(ValueError, match="Point-in-Time Recovery"):
        SourceSpec(table_name="t", key_columns=("pk",), pitr_enabled=False).validate()


def test_source_requires_keys():
    with pytest.raises(ValueError, match="key column"):
        SourceSpec(table_name="t", key_columns=()).validate()


def test_valid_source_passes():
    SourceSpec(table_name="orders", key_columns=("pk", "sk")).validate()


def test_table_spec_identifier_rules():
    with pytest.raises(ValueError, match="invalid namespace"):
        TableSpec(namespace="bad ns", name="t", key_columns=("pk",)).validate()
    with pytest.raises(ValueError, match="invalid table name"):
        TableSpec(namespace="ns", name="9bad-name!", key_columns=("pk",)).validate()


def test_table_spec_key_partition_overlap():
    with pytest.raises(ValueError, match="both key and partition"):
        TableSpec(
            namespace="ns", name="t", key_columns=("pk",), partition_columns=("pk",)
        ).validate()


def test_table_spec_maintenance_days():
    with pytest.raises(ValueError, match="retention days"):
        TableSpec(
            namespace="ns", name="t", key_columns=("pk",), unreferenced_days=0
        ).validate()


def test_sanitize_identifier():
    # A4: the reference's replace(/[^a-zA-Z0-9]/g,'') (ts:74)
    assert sanitize_identifier("My-Table_01!") == "MyTable01"
    assert sanitize_identifier("...") == ""
