"""Configurable computed-field names + field-default heuristics (C14).

Reference semantics:
- ``PostMeta`` metaclass builds the Post item with USER-CONFIGURABLE names
  for the computed NLP fields — category/caption/summary/siblings/related
  are roles, their column names come from settings
  (/root/reference/src/newsutils/conf/post_item.py:24-29,
  conf/posts.py:46-57, conf/mixins.py:72-76 ``*_field`` properties).
- field defaults follow naming conventions: plural (``*s`` but not
  ``*ss``) → empty list, ``is_*`` → False, else None
  (conf/utils.py:22-23 ``is_plural``/``is_bool``, :75-88 ``__missing__``).

Engine expression: the Post "item class" is a StructType; renaming a role
is a schema transformation, and the NLP jobs accept a role→name map so a
deployment that calls its sibling column ``similar`` runs unchanged
(tests/test_conf.py drives the whole day job under renamed columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import schemas

# the computed-field ROLES (keys) with their canonical column names (values)
# — mirrors settings['POSTS'][{category,caption,summary,siblings,related}_field]
COMPUTED_FIELD_ROLES = {
    "category": "category",
    "caption": "caption",
    "summary": "summary",
    "siblings": "siblings",
    "related": "related",
}


def resolve_field_names(field_names: dict[str, str] | None) -> dict[str, str]:
    """role → configured column name, canonical names for absent roles."""
    names = dict(COMPUTED_FIELD_ROLES)
    if field_names:
        unknown = set(field_names) - set(COMPUTED_FIELD_ROLES)
        if unknown:
            raise ValueError(f"unknown computed-field roles: {sorted(unknown)}")
        names.update(field_names)
    if len(set(names.values())) != len(names):
        raise ValueError(f"computed-field names collide: {names}")
    return names


def build_posts_schema(field_names: dict[str, str] | None = None) -> T.StructType:
    """The PostMeta analog: the POSTS schema with computed-field roles
    renamed per configuration. Non-computed columns are fixed; a configured
    name may not shadow one of them."""
    names = resolve_field_names(field_names)
    base_names = {f.name for f in schemas.POSTS.fields} - set(COMPUTED_FIELD_ROLES)
    clash = set(names.values()) & base_names
    if clash:
        raise ValueError(f"computed-field names shadow base columns: {sorted(clash)}")
    fields = []
    for f in schemas.POSTS.fields:
        if f.name in COMPUTED_FIELD_ROLES:
            fields.append(T.StructField(names[f.name], f.dataType, f.nullable))
        else:
            fields.append(f)
    return T.StructType(fields)


def is_plural(name: str) -> bool:
    """conf/utils.py:22 — ``*s`` but not ``*ss``."""
    return name.endswith("s") and not name.endswith("ss")


def is_bool(name: str) -> bool:
    """conf/utils.py:23 — ``is_*``."""
    return name.startswith("is_")


def default_for_field(field: T.StructField) -> Column:
    """The ``__missing__`` heuristic (conf/utils.py:75-88) as a typed
    Column: plural array fields default to [], ``is_*`` booleans to False,
    everything else to NULL of the field's type."""
    if is_plural(field.name) and isinstance(field.dataType, T.ArrayType):
        return F.array().cast(field.dataType)
    if is_bool(field.name) and isinstance(field.dataType, T.BooleanType):
        return F.lit(False)
    return F.lit(None).cast(field.dataType)


def with_defaults(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Conform ``df`` to ``schema``: missing columns materialize with their
    heuristic defaults, present columns have NULLs in plural/is_* fields
    coalesced to the same defaults — the set-wise equivalent of the
    reference's per-item default factory."""
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        if f.name not in have:
            cols.append(default_for_field(f).alias(f.name))
        elif (is_plural(f.name) and isinstance(f.dataType, T.ArrayType)) or \
                (is_bool(f.name) and isinstance(f.dataType, T.BooleanType)):
            cols.append(F.coalesce(F.col(f.name).cast(f.dataType),
                                   default_for_field(f)).alias(f.name))
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)
