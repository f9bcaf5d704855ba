"""Pipedrive entity specs: dims (pipelines, stages, users), entities
(organizations, persons) and facts (deals, activities).

Multi-tenant: every table is keyed (id, scope), scope ∈ {comercial,
expansao} (reference: ADR-003 multi-tenant single table;
sql/schemas/04_core_tables.sql:192). Column families cited from
src/transformers/normalize_pipedrive.py: dims :118-343, orgs :345-463,
persons :465-627, deals :629-794, activities :796-922; `_safe_*`
coercions :63-112; custom-fields rescue :400-426,707-739; primary
email/phone selection :554-577.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.safe import safe_bool
from .base import EntitySpec, register_spec

R = lambda f: F.col(f"raw.{f}")  # noqa: E731


def _struct(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, t: T.DataType = T.StringType()) -> T.StructField:
    return T.StructField(name, t)


def custom_fields_rescue(known: tuple[str, ...]) -> Column:
    """P10: keys ∉ known standard fields and not '_'-prefixed land in a
    custom_fields JSON document (normalize_pipedrive.py:400-426). The
    raw payload is reparsed as map<string,string> and filtered — the
    schema-diff happens per row, columnar, no Python."""
    m = F.from_json(F.col("raw_data"), "map<string,string>")
    known_arr = F.array([F.lit(k) for k in known])
    residual = F.map_filter(
        m, lambda k, v: (~F.array_contains(known_arr, k)) & (~k.startswith("_")) & v.isNotNull()
    )
    return F.when(F.size(F.map_keys(residual)) > 0, F.to_json(residual))


def _safe_text_json(field: str) -> Column:
    """_safe_text dict-unwrap (normalize_pipedrive.py:92-112): value that
    is sometimes a scalar, sometimes {'value'|'id'|'name': ...}."""
    # A dict-valued field reaches us as its JSON text (string-typed schema
    # stringifies objects) — detect that case and unwrap value/id/name.
    unwrapped = F.coalesce(
        F.get_json_object(R(field), "$.value"),
        F.get_json_object(R(field), "$.id"),
        F.get_json_object(R(field), "$.name"),
    )
    return F.when(F.ltrim(R(field)).startswith("{"), unwrapped).otherwise(R(field))


_CONTACT_ITEM = _struct(_f("value"), _f("primary", T.BooleanType()), _f("label"))


def primary_contact(field: str) -> Column:
    """Prefer the element with primary=true, else the first
    (normalize_pipedrive.py:554-577) — pure higher-order functions."""
    arr = R(field)
    primaries = F.filter(arr, lambda e: F.coalesce(e.getField("primary"), F.lit(False)))
    chosen = F.coalesce(F.try_element_at(primaries, F.lit(1)), F.try_element_at(arr, F.lit(1)))
    return chosen.getField("value")


# ---------------------------------------------------------------------------
# Dims
# ---------------------------------------------------------------------------

PIPELINES_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"), _f("order_nr", T.IntegerType()),
    _f("active", T.BooleanType()), _f("deal_probability", T.BooleanType()),
    _f("add_time"), _f("update_time"),
)


def _pipelines_columns() -> dict[str, Column]:
    return {
        "pipeline_id": R("id"),
        "name": R("name"),
        "order_nr": R("order_nr"),
        "active": F.coalesce(safe_bool(R("active")), F.lit(False)),
        "deal_probability": safe_bool(R("deal_probability")),
        "add_time": R("add_time").try_cast("timestamp"),
        "update_time": R("update_time").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="pd_pipelines",
        source="pipedrive",
        entity="pipelines",
        stg_key=("id",),
        core_key=("pipeline_id",),
        dedupe_order="_loaded_at",
        payload_schema=PIPELINES_SCHEMA,
        columns=_pipelines_columns,
        scoped=True,
    )
)

STAGES_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"), _f("pipeline_id", T.LongType()),
    _f("order_nr", T.IntegerType()), _f("active_flag", T.BooleanType()),
    _f("deal_probability", T.IntegerType()), _f("rotten_flag", T.BooleanType()),
    _f("rotten_days", T.IntegerType()), _f("add_time"), _f("update_time"),
)


def _stages_columns() -> dict[str, Column]:
    return {
        "stage_id": R("id"),
        "name": R("name"),
        "pipeline_id": R("pipeline_id"),
        "order_nr": R("order_nr"),
        "active_flag": F.coalesce(safe_bool(R("active_flag")), F.lit(False)),
        "deal_probability": R("deal_probability"),
        "rotten_flag": safe_bool(R("rotten_flag")),
        "rotten_days": R("rotten_days"),
        "add_time": R("add_time").try_cast("timestamp"),
        "update_time": R("update_time").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="pd_stages",
        source="pipedrive",
        entity="stages",
        stg_key=("id",),
        core_key=("stage_id",),
        dedupe_order="_loaded_at",
        payload_schema=STAGES_SCHEMA,
        columns=_stages_columns,
        scoped=True,
    )
)

USERS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"), _f("email"),
    _f("active_flag", T.BooleanType()), _f("is_admin", T.IntegerType()),
    _f("role_id", T.LongType()), _f("timezone_name"),
    _f("created"), _f("modified"),
)


def _users_columns() -> dict[str, Column]:
    return {
        "user_id": R("id"),
        "name": R("name"),
        "email": R("email"),
        "active_flag": F.coalesce(safe_bool(R("active_flag")), F.lit(False)),
        "is_admin": R("is_admin"),
        "role_id": R("role_id"),
        "timezone_name": R("timezone_name"),
        "created": R("created").try_cast("timestamp"),
        "modified": R("modified").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="pd_users",
        source="pipedrive",
        entity="users",
        stg_key=("id",),
        core_key=("user_id",),
        dedupe_order="_loaded_at",
        payload_schema=USERS_SCHEMA,
        columns=_users_columns,
        scoped=True,
    )
)


# ---------------------------------------------------------------------------
# Organizations / persons
# ---------------------------------------------------------------------------

_ORG_KNOWN = (
    "id", "name", "owner_id", "address", "address_locality", "cc_email",
    "active_flag", "people_count", "open_deals_count", "closed_deals_count",
    "won_deals_count", "lost_deals_count", "add_time", "update_time",
)

ORGS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"), _f("owner_id", T.LongType()),
    _f("address"), _f("address_locality"), _f("cc_email"),
    _f("active_flag", T.BooleanType()), _f("people_count", T.IntegerType()),
    _f("open_deals_count", T.IntegerType()), _f("closed_deals_count", T.IntegerType()),
    _f("won_deals_count", T.IntegerType()), _f("lost_deals_count", T.IntegerType()),
    _f("add_time"), _f("update_time"),
)


def _orgs_columns() -> dict[str, Column]:
    return {
        "org_id": R("id"),
        "name": R("name"),
        "owner_id": R("owner_id"),
        "address": R("address"),
        "address_locality": R("address_locality"),
        "cc_email": R("cc_email"),
        "active_flag": F.coalesce(safe_bool(R("active_flag")), F.lit(False)),
        "people_count": R("people_count"),
        "open_deals_count": R("open_deals_count"),
        "won_deals_count": R("won_deals_count"),
        "lost_deals_count": R("lost_deals_count"),
        "add_time": R("add_time").try_cast("timestamp"),
        "update_time": R("update_time").try_cast("timestamp"),
        "custom_fields": custom_fields_rescue(_ORG_KNOWN),
    }


register_spec(
    EntitySpec(
        name="pd_organizations",
        source="pipedrive",
        entity="organizations",
        stg_key=("id",),
        core_key=("org_id",),
        dedupe_order="update_time",
        payload_schema=ORGS_SCHEMA,
        columns=_orgs_columns,
        scoped=True,
        custom_fields_known=_ORG_KNOWN,
    )
)

PERSONS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"), _f("first_name"), _f("last_name"),
    _f("org_id", T.LongType()), _f("owner_id", T.LongType()),
    _f("visible_to", T.IntegerType()), _f("active_flag", T.BooleanType()),
    _f("open_deals_count", T.IntegerType()), _f("won_deals_count", T.IntegerType()),
    _f("lost_deals_count", T.IntegerType()),
    _f("email", T.ArrayType(_CONTACT_ITEM)),
    _f("phone", T.ArrayType(_CONTACT_ITEM)),
    _f("add_time"), _f("update_time"),
)


def _persons_columns() -> dict[str, Column]:
    return {
        "person_id": R("id"),
        "name": R("name"),
        "first_name": R("first_name"),
        "last_name": R("last_name"),
        "org_id": R("org_id"),
        "owner_id": R("owner_id"),
        "active_flag": F.coalesce(safe_bool(R("active_flag")), F.lit(False)),
        "email": primary_contact("email"),
        "phone": primary_contact("phone"),
        "open_deals_count": R("open_deals_count"),
        "won_deals_count": R("won_deals_count"),
        "lost_deals_count": R("lost_deals_count"),
        "add_time": R("add_time").try_cast("timestamp"),
        "update_time": R("update_time").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="pd_persons",
        source="pipedrive",
        entity="persons",
        stg_key=("id",),
        core_key=("person_id",),
        dedupe_order="update_time",
        payload_schema=PERSONS_SCHEMA,
        columns=_persons_columns,
        scoped=True,
    )
)


# ---------------------------------------------------------------------------
# Facts: deals, activities
# ---------------------------------------------------------------------------

_DEAL_KNOWN = (
    "id", "title", "value", "currency", "status", "person_id", "org_id",
    "user_id", "pipeline_id", "stage_id", "expected_close_date", "probability",
    "won_time", "lost_time", "close_time", "add_time", "update_time",
    "stage_change_time", "lost_reason", "visible_to", "activities_count",
    "done_activities_count", "undone_activities_count", "files_count",
    "notes_count", "followers_count", "email_messages_count", "products_count",
    "next_activity_date", "last_activity_date", "origin", "channel", "deleted",
)

DEALS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("title"), _f("value", T.StringType()), _f("currency"),
    _f("status"), _f("person_id", T.LongType()), _f("org_id", T.LongType()),
    _f("user_id", T.LongType()), _f("pipeline_id", T.LongType()),
    _f("stage_id", T.LongType()), _f("expected_close_date"),
    _f("probability", T.IntegerType()), _f("won_time"), _f("lost_time"),
    _f("close_time"), _f("add_time"), _f("update_time"), _f("stage_change_time"),
    _f("lost_reason"), _f("visible_to", T.IntegerType()),
    _f("activities_count", T.IntegerType()), _f("done_activities_count", T.IntegerType()),
    _f("undone_activities_count", T.IntegerType()), _f("files_count", T.IntegerType()),
    _f("notes_count", T.IntegerType()), _f("followers_count", T.IntegerType()),
    _f("email_messages_count", T.IntegerType()), _f("products_count", T.IntegerType()),
    _f("next_activity_date"), _f("last_activity_date"), _f("origin"),
    _f("channel", T.IntegerType()), _f("deleted", T.BooleanType()),
)


def _deals_columns() -> dict[str, Column]:
    return {
        "deal_id": R("id"),
        "title": R("title"),
        "value": R("value").try_cast("decimal(15,2)"),
        "currency": R("currency"),
        "status": R("status"),
        "person_id": R("person_id"),
        "org_id": R("org_id"),
        "user_id": R("user_id"),
        "pipeline_id": R("pipeline_id"),
        "stage_id": R("stage_id"),
        "expected_close_date": R("expected_close_date").try_cast("date"),
        "probability": R("probability"),
        "won_time": R("won_time").try_cast("timestamp"),
        "lost_time": R("lost_time").try_cast("timestamp"),
        "close_time": R("close_time").try_cast("timestamp"),
        "add_time": R("add_time").try_cast("timestamp"),
        "update_time": R("update_time").try_cast("timestamp"),
        "stage_change_time": R("stage_change_time").try_cast("timestamp"),
        "lost_reason": R("lost_reason"),
        "visible_to": R("visible_to"),
        "activities_count": R("activities_count"),
        "done_activities_count": R("done_activities_count"),
        "undone_activities_count": R("undone_activities_count"),
        "files_count": R("files_count"),
        "notes_count": R("notes_count"),
        "followers_count": R("followers_count"),
        "email_messages_count": R("email_messages_count"),
        "products_count": R("products_count"),
        "next_activity_date": R("next_activity_date").try_cast("date"),
        "last_activity_date": R("last_activity_date").try_cast("date"),
        "origin": R("origin"),
        "channel": R("channel"),
        "custom_fields": custom_fields_rescue(_DEAL_KNOWN),
    }


register_spec(
    EntitySpec(
        name="pd_deals",
        source="pipedrive",
        entity="deals",
        stg_key=("id",),
        core_key=("deal_id",),
        dedupe_order="update_time",
        payload_schema=DEALS_SCHEMA,
        columns=_deals_columns,
        scoped=True,
        custom_fields_known=_DEAL_KNOWN,
    )
)

ACTIVITIES_SCHEMA = _struct(
    _f("id", T.LongType()), _f("type"), _f("subject"), _f("note"),
    _f("done", T.BooleanType()), _f("busy_flag", T.BooleanType()),
    _f("user_id", T.LongType()), _f("deal_id", T.LongType()),
    _f("person_id", T.LongType()), _f("org_id", T.LongType()),
    _f("lead_id"), _f("project_id", T.LongType()), _f("due_date"),
    _f("due_time"), _f("duration"), _f("add_time"),
    _f("marked_as_done_time"), _f("update_time"), _f("location"),
)


def _activities_columns() -> dict[str, Column]:
    return {
        "activity_id": R("id"),
        "type": R("type"),
        "subject": R("subject"),
        "note": R("note"),
        "done": F.coalesce(safe_bool(R("done")), F.lit(False)),
        "busy_flag": safe_bool(R("busy_flag")),
        "user_id": R("user_id"),
        "deal_id": R("deal_id"),
        "person_id": R("person_id"),
        "org_id": R("org_id"),
        "lead_id": R("lead_id"),
        "project_id": R("project_id"),
        "due_date": R("due_date").try_cast("date"),
        # string-or-dict fields (P11 _safe_text, normalize_pipedrive.py:890-895):
        "due_time": _safe_text_json("due_time"),
        "duration": _safe_text_json("duration"),
        "location": _safe_text_json("location"),
        "add_time": R("add_time").try_cast("timestamp"),
        "marked_as_done_time": R("marked_as_done_time").try_cast("timestamp"),
        "update_time": R("update_time").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="pd_activities",
        source="pipedrive",
        entity="activities",
        stg_key=("id",),
        core_key=("activity_id",),
        dedupe_order="update_time",
        payload_schema=ACTIVITIES_SCHEMA,
        columns=_activities_columns,
        scoped=True,
    )
)
