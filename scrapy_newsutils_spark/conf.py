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


# ---------------------------------------------------------------------------
# Settings machinery: env -> project -> defaults layering (the reference's
# AppSettings, /root/reference/src/newsutils/appsettings.py:17-38,57-250 —
# capitalized defaults, a nested config under a config key, env overrides,
# required settings that must be explicit, and computed settings derived
# from the configurable ones, conf/posts.py:40-64).

class ImproperlyConfigured(ValueError):
    """A required setting has no default and was not defined explicitly."""


class AppSettings:
    """Layered settings: ``env > project > defaults``.

    - ``defaults``: the app's config dict; a ``None`` value marks the
      setting REQUIRED (reference: 'a value of None signifies a required
      setting', conf/posts.py:71-73).
    - ``project``: deployment overrides (the reference patches the
      project's Scrapy/Django settings module; the engine takes a plain
      dict — no module injection, a Spark job has no global settings
      module to patch).
    - env: ``{prefix}{KEY}`` variables win over everything; values are
      JSON-decoded when possible ('42' -> 42, '["a"]' -> list) so typed
      settings survive the env round trip.
    """

    def __init__(self, defaults: dict, config_key: str = "POSTS",
                 project: dict | None = None,
                 required: tuple[str, ...] = (),
                 env_prefix: str = "NEWSUTILS_",
                 env: dict | None = None):
        import os as _os

        self.config_key = config_key
        self.defaults = dict(defaults)
        self.project = dict(project or {})
        self.required = tuple(required) + tuple(
            k for k, v in self.defaults.items() if v is None)
        self.env_prefix = env_prefix
        self._env = _os.environ if env is None else env

    def __getitem__(self, key: str):
        import json as _json

        raw = self._env.get(f"{self.env_prefix}{key}")
        if raw is not None:
            try:
                return _json.loads(raw)
            except (ValueError, TypeError):
                return raw
        if key in self.project:
            return self.project[key]
        val = self.defaults.get(key)
        if val is None and key in self.required:
            raise ImproperlyConfigured(
                f'required `{self.config_key}["{key}"]` has no default; '
                "define it in the project dict or "
                f"{self.env_prefix}{key}")
        if key not in self.defaults and key not in self.project:
            raise KeyError(key)
        return val

    def get(self, key: str, default=None):
        try:
            return self[key]
        except (KeyError, ImproperlyConfigured):
            return default

    def as_dict(self) -> dict:
        return {k: self[k] for k in self.defaults}


# the engine's Posts defaults — reference conf/posts.py:95-160 keys that map
# onto engine operators (Mongo/Scrapy plumbing keys have no engine meaning)
POSTS_DEFAULTS = {
    "DB_ID_FIELD": "post_id",
    "ITEM_ID_FIELD": "short_link",
    "CATEGORY_FIELD": "category",
    "CAPTION_FIELD": "caption",
    "SUMMARY_FIELD": "summary",
    "SIBLINGS_FIELD": "siblings",
    "RELATED_FIELD": "related",
    "EDITS_NEW_VERSION_FIELDS": ["text", "title"],
    "SIMILARITY_SIBLINGS_THRESHOLD": 0.4,
    "SIMILARITY_RELATED_THRESHOLD": 0.2,
    "SIMILARITY_MAX_DOCS": 2,
    "IMAGE_MIN_WIDTH": 300,
    "IMAGE_MIN_HEIGHT": 200,
    "IMAGE_BRISQUE_MAX_SCORE": 50.0,
    "EPOCH_BUDGET_MS": 60_000,
    "AUTO_PUBLISH": True,
}


def posts_settings(project: dict | None = None,
                   env: dict | None = None) -> AppSettings:
    return AppSettings(POSTS_DEFAULTS, "POSTS", project=project, env=env)


# -- computed settings (reference conf/posts.py:40-64: nlp_fields /
#    computed_fields / edits_excluded_fields derive from the *_FIELD names)

def settings_field_names(s: AppSettings) -> dict[str, str]:
    """The role→name map the NLP jobs take (resolve_field_names input)."""
    return {role: s[f"{role.upper()}_FIELD"] for role in COMPUTED_FIELD_ROLES}


def settings_nlp_fields(s: AppSettings) -> list[str]:
    return list(settings_field_names(s).values()) + ["tags", "keywords",
                                                     "excerpt"]


def settings_edits_excluded_fields(s: AppSettings) -> set[str]:
    """edits_excluded_fields = version + ids + all nlp_fields (the
    reference's computed exclusion, conf/posts.py:59-64 — tags/keywords/
    excerpt included) plus the engine's link_hash/created_ts row metadata."""
    return {"version", s["DB_ID_FIELD"], s["ITEM_ID_FIELD"], "link_hash",
            "created_ts", *settings_nlp_fields(s)}
