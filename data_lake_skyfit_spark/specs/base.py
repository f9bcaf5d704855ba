"""Entity specification registry.

The reference implements each entity as a hand-written extractor +
loader + normalizer script (7 near-identical normalize_* files). The
engine replaces that with ONE parameterized pipeline driven by
declarative per-entity specs (SURVEY.md §7.0): source, staging key,
dedupe ordering, typed CORE projections, child-array specs, merge
behavior.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import types as T

from ..operators.merge import MergeMode

ColumnMap = Callable[[], dict[str, Column]]


@dataclass(frozen=True)
class ChildSpec:
    """A nested-array child table (J1 explode): memberships[], saleItens[],
    tags[] ... One row per array element, carrying parent keys."""

    name: str
    array_col: str  # payload field holding the array
    parent_cols: dict[str, str]  # child col name -> parent CORE col
    columns: ColumnMap  # projections over the exploded element `x`
    key: tuple[str, ...]
    merge_mode: str = MergeMode.UPDATE_ALL
    update_subset: tuple[str, ...] = ()
    element_filter: Callable[[Column], Column] | None = None


@dataclass(frozen=True)
class EntitySpec:
    name: str  # CORE table name, e.g. "evo_members"
    source: str  # evo | pipedrive | zendesk
    entity: str  # bronze entity= partition value
    stg_key: tuple[str, ...]  # staging conflict key (K4)
    core_key: tuple[str, ...]  # CORE conflict key
    dedupe_order: str  # recency column for latest-wins (W1)
    payload_schema: T.StructType  # declared shape of the raw document
    columns: ColumnMap  # CORE typed projections (P1-P4, P11)
    scoped: bool = False  # multi-tenant (id, scope) keying
    children: tuple[ChildSpec, ...] = ()
    partition_by: tuple[str, ...] = ()  # CORE partition columns
    merge_mode: str = MergeMode.UPDATE_ALL
    update_subset: tuple[str, ...] = ()
    derived_key: Callable[[], dict[str, Column]] | None = None  # synthetic keys (entries)
    custom_fields_known: tuple[str, ...] = ()  # P10 rescue: known top-level keys
    required_fields: tuple[str, ...] = ()  # P7: payload fields that must be non-null


_REGISTRY: dict[str, EntitySpec] = {}


def register_spec(spec: EntitySpec) -> EntitySpec:
    _REGISTRY[spec.name] = spec
    return spec


def spec_registry() -> dict[str, EntitySpec]:
    from . import evo, pipedrive, zendesk  # noqa: F401  (registration side-effects)

    return dict(_REGISTRY)


def get_spec(name: str) -> EntitySpec:
    return spec_registry()[name]
