"""Zendesk entity specs: organizations, users, groups, ticket_fields,
ticket_forms, and the tickets fact with derived child tables
zd_ticket_tags (insert-only, deduped) and zd_ticket_custom_fields
(DISTINCT ON keep-latest, empty values filtered).

Single-tenant — no scope column (reference: normalize_zendesk.py:588
keys on plain id; SURVEY.md §7.4.5). Column families cited from
src/transformers/normalize_zendesk.py: orgs :105-195, users :195-320,
groups/fields/forms :322-578, tickets :596-703, tags :705-762,
custom fields :764-829.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.safe import safe_bool
from ..operators.merge import MergeMode
from .base import ChildSpec, EntitySpec, register_spec

R = lambda f: F.col(f"raw.{f}")  # noqa: E731


def _struct(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, t: T.DataType = T.StringType()) -> T.StructField:
    return T.StructField(name, t)


# ---------------------------------------------------------------------------
# Dims
# ---------------------------------------------------------------------------

ZD_ORGS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"),
    _f("domain_names", T.ArrayType(T.StringType())),
    _f("group_id", T.LongType()), _f("shared_tickets", T.BooleanType()),
    _f("shared_comments", T.BooleanType()), _f("external_id"),
    _f("tags", T.ArrayType(T.StringType())),
    _f("organization_fields", T.MapType(T.StringType(), T.StringType())),
    _f("created_at"), _f("updated_at"),
)


def _zd_orgs_columns() -> dict[str, Column]:
    return {
        "organization_id": R("id"),
        "name": R("name"),
        "domain_names": F.to_json(R("domain_names")),  # JSONB array (04_core_tables.sql:264)
        "group_id": R("group_id"),
        "shared_tickets": F.coalesce(safe_bool(R("shared_tickets")), F.lit(False)),
        "shared_comments": F.coalesce(safe_bool(R("shared_comments")), F.lit(False)),
        "external_id": R("external_id"),
        "tags": F.to_json(R("tags")),
        "organization_fields": F.to_json(R("organization_fields")),
        "created_at": R("created_at").try_cast("timestamp"),
        "updated_at": R("updated_at").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="zd_organizations",
        source="zendesk",
        entity="organizations",
        stg_key=("id",),
        core_key=("organization_id",),
        dedupe_order="updated_at",
        payload_schema=ZD_ORGS_SCHEMA,
        columns=_zd_orgs_columns,
    )
)

ZD_USERS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"), _f("email"), _f("phone"), _f("role"),
    _f("organization_id", T.LongType()), _f("time_zone"), _f("locale"),
    _f("active", T.BooleanType()), _f("verified", T.BooleanType()),
    _f("suspended", T.BooleanType()), _f("tags", T.ArrayType(T.StringType())),
    _f("user_fields", T.MapType(T.StringType(), T.StringType())),
    _f("external_id"), _f("alias"), _f("notes"), _f("details"),
    _f("default_group_id", T.LongType()),
    _f("created_at"), _f("updated_at"), _f("last_login_at"),
)


def _zd_users_columns() -> dict[str, Column]:
    return {
        "user_id": R("id"),
        "name": R("name"),
        "email": R("email"),
        "phone": R("phone"),
        "role": R("role"),
        "organization_id": R("organization_id"),
        "time_zone": R("time_zone"),
        "locale": R("locale"),
        "active": F.coalesce(safe_bool(R("active")), F.lit(False)),
        "verified": F.coalesce(safe_bool(R("verified")), F.lit(False)),
        "suspended": F.coalesce(safe_bool(R("suspended")), F.lit(False)),
        "tags": F.to_json(R("tags")),
        "user_fields": F.to_json(R("user_fields")),
        "external_id": R("external_id"),
        "alias": R("alias"),
        "notes": R("notes"),
        "details": R("details"),
        "default_group_id": R("default_group_id"),
        "created_at": R("created_at").try_cast("timestamp"),
        "updated_at": R("updated_at").try_cast("timestamp"),
        "last_login_at": R("last_login_at").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="zd_users",
        source="zendesk",
        entity="users",
        stg_key=("id",),
        core_key=("user_id",),
        dedupe_order="updated_at",
        payload_schema=ZD_USERS_SCHEMA,
        columns=_zd_users_columns,
    )
)

ZD_GROUPS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"), _f("description"),
    _f("default", T.BooleanType()), _f("deleted", T.BooleanType()),
    _f("created_at"), _f("updated_at"),
)


def _zd_groups_columns() -> dict[str, Column]:
    return {
        "group_id": R("id"),
        "name": R("name"),
        "description": R("description"),
        "is_default": F.coalesce(safe_bool(R("default")), F.lit(False)),
        "deleted": F.coalesce(safe_bool(R("deleted")), F.lit(False)),
        "created_at": R("created_at").try_cast("timestamp"),
        "updated_at": R("updated_at").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="zd_groups",
        source="zendesk",
        entity="groups",
        stg_key=("id",),
        core_key=("group_id",),
        dedupe_order="updated_at",
        payload_schema=ZD_GROUPS_SCHEMA,
        columns=_zd_groups_columns,
    )
)

ZD_TICKET_FIELDS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("type"), _f("title"), _f("description"),
    _f("position", T.IntegerType()), _f("active", T.BooleanType()),
    _f("required", T.BooleanType()), _f("removable", T.BooleanType()),
    _f("created_at"), _f("updated_at"),
)


def _zd_ticket_fields_columns() -> dict[str, Column]:
    return {
        "field_id": R("id"),
        "type": R("type"),
        "title": R("title"),
        "description": R("description"),
        "position": R("position"),
        "active": F.coalesce(safe_bool(R("active")), F.lit(False)),
        "required": F.coalesce(safe_bool(R("required")), F.lit(False)),
        "removable": F.coalesce(safe_bool(R("removable")), F.lit(True)),
        "created_at": R("created_at").try_cast("timestamp"),
        "updated_at": R("updated_at").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="zd_ticket_fields",
        source="zendesk",
        entity="ticket_fields",
        stg_key=("id",),
        core_key=("field_id",),
        dedupe_order="updated_at",
        payload_schema=ZD_TICKET_FIELDS_SCHEMA,
        columns=_zd_ticket_fields_columns,
    )
)

ZD_TICKET_FORMS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("name"), _f("display_name"),
    _f("position", T.IntegerType()), _f("active", T.BooleanType()),
    _f("default", T.BooleanType()), _f("end_user_visible", T.BooleanType()),
    _f("ticket_field_ids", T.ArrayType(T.LongType())),
    _f("created_at"), _f("updated_at"),
)


def _zd_ticket_forms_columns() -> dict[str, Column]:
    return {
        "form_id": R("id"),
        "name": R("name"),
        "display_name": R("display_name"),
        "position": R("position"),
        "active": F.coalesce(safe_bool(R("active")), F.lit(False)),
        "is_default": F.coalesce(safe_bool(R("default")), F.lit(False)),
        "end_user_visible": F.coalesce(safe_bool(R("end_user_visible")), F.lit(True)),
        "ticket_field_ids": F.to_json(R("ticket_field_ids")),
        "created_at": R("created_at").try_cast("timestamp"),
        "updated_at": R("updated_at").try_cast("timestamp"),
    }


register_spec(
    EntitySpec(
        name="zd_ticket_forms",
        source="zendesk",
        entity="ticket_forms",
        stg_key=("id",),
        core_key=("form_id",),
        dedupe_order="updated_at",
        payload_schema=ZD_TICKET_FORMS_SCHEMA,
        columns=_zd_ticket_forms_columns,
    )
)


# ---------------------------------------------------------------------------
# Tickets fact + derived children
# ---------------------------------------------------------------------------

ZD_TICKETS_SCHEMA = _struct(
    _f("id", T.LongType()), _f("subject"), _f("description"), _f("status"),
    _f("priority"), _f("type"),
    _f("requester_id", T.LongType()), _f("submitter_id", T.LongType()),
    _f("assignee_id", T.LongType()), _f("organization_id", T.LongType()),
    _f("group_id", T.LongType()), _f("brand_id", T.LongType()),
    _f("ticket_form_id", T.LongType()), _f("external_id"),
    _f("via", _struct(_f("channel"), _f("source", T.MapType(T.StringType(), T.StringType())))),
    _f("is_public", T.BooleanType()), _f("has_incidents", T.BooleanType()),
    _f("allow_channelback", T.BooleanType()), _f("allow_attachments", T.BooleanType()),
    _f("tags", T.ArrayType(T.StringType())),
    _f("custom_fields", T.ArrayType(_struct(_f("id", T.LongType()), _f("value")))),
    _f("created_at"), _f("updated_at"),
)


def _zd_tickets_columns() -> dict[str, Column]:
    return {
        "ticket_id": R("id"),
        "subject": R("subject"),
        "description": R("description"),
        "status": R("status"),
        "priority": R("priority"),
        "type": R("type"),
        "requester_id": R("requester_id"),
        "submitter_id": R("submitter_id"),
        "assignee_id": R("assignee_id"),
        "organization_id": R("organization_id"),
        "group_id": R("group_id"),
        "brand_id": R("brand_id"),
        "ticket_form_id": R("ticket_form_id"),
        "external_id": R("external_id"),
        "via_channel": R("via").getField("channel"),
        "via_source": F.to_json(R("via").getField("source")),
        "is_public": F.coalesce(safe_bool(R("is_public")), F.lit(True)),
        "has_incidents": F.coalesce(safe_bool(R("has_incidents")), F.lit(False)),
        "allow_channelback": safe_bool(R("allow_channelback")),
        "allow_attachments": safe_bool(R("allow_attachments")),
        "tags": F.to_json(R("tags")),
        "created_at": R("created_at").try_cast("timestamp"),
        "updated_at": R("updated_at").try_cast("timestamp"),
    }


def _tag_columns() -> dict[str, Column]:
    return {"tag": F.col("x")}


def _cf_columns() -> dict[str, Column]:
    x = F.col("x")
    return {"field_id": x.getField("id"), "value": x.getField("value")}


register_spec(
    EntitySpec(
        name="zd_tickets",
        source="zendesk",
        entity="tickets",
        stg_key=("id",),
        core_key=("ticket_id",),
        dedupe_order="updated_at",
        payload_schema=ZD_TICKETS_SCHEMA,
        columns=_zd_tickets_columns,
        children=(
            # tags[] explode → (ticket_id, tag), insert-only DO NOTHING
            # with in-batch dedupe (normalize_zendesk.py:705-762).
            ChildSpec(
                name="zd_ticket_tags",
                array_col="tags",
                parent_cols={"ticket_id": "ticket_id"},
                columns=_tag_columns,
                key=("ticket_id", "tag"),
                merge_mode=MergeMode.DO_NOTHING,
                element_filter=lambda x: x.isNotNull() & (x != ""),
            ),
            # custom_fields[] explode → keep-latest per (ticket_id,
            # field_id), null/empty values dropped
            # (normalize_zendesk.py:764-829 DISTINCT ON + :780-781 filter).
            ChildSpec(
                name="zd_ticket_custom_fields",
                array_col="custom_fields",
                parent_cols={"ticket_id": "ticket_id"},
                columns=_cf_columns,
                key=("ticket_id", "field_id"),
                element_filter=lambda x: x.getField("value").isNotNull()
                & (x.getField("value") != ""),
            ),
        ),
    )
)
