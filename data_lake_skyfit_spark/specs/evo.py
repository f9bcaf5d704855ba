"""EVO entity specs: members (+memberships, +contacts), sales (+items,
+receivables), entries (synthetic key, year-partitioned), prospects.

Projections mirror the reference normalizers column-for-column where
cited; coercions are NULL-on-failure (try_cast) per the `_safe_*`
convention. Citations per column family:
- members:      src/evo/transformers/normalize_evo_members_v2.py:131-185
- memberships:  normalize_evo_members_v2.py:245-291 (partial update :225-230)
- contacts:     normalize_evo_members_v2.py:332-347
- sales:        src/evo/transformers/normalize_evo_sales_v2.py:159-181
- sale items:   normalize_evo_sales_v2.py:247-279
- receivables:  normalize_evo_sales_v2.py:324-349 (nested status/paymentType)
- entries:      src/evo/transformers/normalize_evo_entries_v2.py:145-175;
                synthetic key load_evo_entries_stg_fast_v2.py:210-223
- prospects:    src/evo/transformers/normalize_evo_prospects.py:124-162
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import entry_id_expr
from ..functions.safe import safe_bool
from ..operators.merge import MergeMode
from .base import ChildSpec, EntitySpec, register_spec

R = lambda f: F.col(f"raw.{f}")  # noqa: E731  payload field access


def _s(c: Column) -> Column:
    return c.cast("string")


def _struct(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, t: T.DataType = T.StringType()) -> T.StructField:
    return T.StructField(name, t)


# ---------------------------------------------------------------------------
# Members
# ---------------------------------------------------------------------------

_CONTACT = _struct(
    _f("idPhone", T.LongType()),
    _f("idContactType", T.IntegerType()),
    _f("typeDescription"),
    _f("ddi"),
    _f("description"),
)

_MEMBERSHIP = _struct(
    _f("idMemberMembership", T.LongType()),
    _f("idMembership", T.LongType()),
    _f("membershipName"),
    _f("idMembershipRenewed", T.LongType()),
    _f("idSale", T.LongType()),
    _f("saleDate"),
    _f("startDate"),
    _f("endDate"),
    _f("cancelDate"),
    _f("membershipStatus"),
    _f("valueNextMonth", T.StringType()),
    _f("originalValue", T.StringType()),
    _f("nextCharge"),
    _f("idCategoryMembership", T.LongType()),
    _f("numMembers", T.IntegerType()),
    _f("flAllowLocker", T.BooleanType()),
    _f("flAdditionalMembership", T.BooleanType()),
    _f("signedTerms", T.BooleanType()),
    _f("limitless", T.BooleanType()),
    _f("weeklyLimit", T.IntegerType()),
    _f("concludedSessions", T.IntegerType()),
    _f("pendingSessions", T.IntegerType()),
)

_EMPLOYEE_REF = _struct(_f("idEmployee", T.LongType()), _f("name"))

MEMBERS_SCHEMA = _struct(
    _f("idMember", T.LongType()),
    _f("idBranch", T.LongType()),
    _f("branchName"),
    _f("firstName"),
    _f("lastName"),
    _f("registerName"),
    _f("registerLastName"),
    _f("usePreferredName", T.BooleanType()),
    _f("document"),
    _f("documentId"),
    _f("gender"),
    _f("birthDate"),
    _f("maritalStatus"),
    _f("address"),
    _f("addressNumber"),
    _f("number"),  # alternate key for addressNumber (:150)
    _f("complement"),
    _f("neighborhood"),
    _f("city"),
    _f("state"),
    _f("country"),
    _f("zipCode"),
    _f("accessCardNumber"),
    _f("accessBlocked", T.BooleanType()),
    _f("blockedReason"),
    _f("status"),
    _f("membershipStatus"),
    _f("penalized", T.BooleanType()),
    _f("totalFitCoins", T.StringType()),
    _f("registerDate"),
    _f("conversionDate"),
    _f("lastAccessDate"),
    _f("updateDate"),
    _f("photo"),
    _f("photoUrl"),  # alternate key (:168)
    _f("gympassId"),
    _f("codeTotalpass"),
    _f("userIdGurupass"),
    _f("clientWithPromotionalRestriction", T.BooleanType()),
    _f("personalTrainer", T.BooleanType()),
    _f("personalType"),
    _f("cref"),
    _f("idEmployeeConsultant", T.LongType()),
    _f("employeeConsultant", _EMPLOYEE_REF),  # flat-or-nested (:177-182)
    _f("idEmployeeInstructor", T.LongType()),
    _f("employeeInstructor", _EMPLOYEE_REF),
    _f("memberMigrationId"),
    _f("idMemberMigration"),  # alternate key (:183)
    _f("contacts", T.ArrayType(_CONTACT)),
    _f("memberships", T.ArrayType(_MEMBERSHIP)),
)


def _first_contact(types: tuple[int, ...]) -> Column:
    """J2: first contact of given types — the correlated LIMIT-1
    subquery (normalize_evo_members_v2.py:142-145) as a higher-order fn."""
    match = F.filter(R("contacts"), lambda c: c.getField("idContactType").isin(*types))
    return F.try_element_at(match, F.lit(1)).getField("description")


def _members_columns() -> dict[str, Column]:
    full_name = F.trim(
        F.concat_ws(" ", F.coalesce(R("firstName"), F.lit("")), F.coalesce(R("lastName"), F.lit("")))
    )
    return {
        "member_id": R("idMember"),
        "branch_id": R("idBranch"),
        "branch_name": R("branchName"),
        "first_name": R("firstName"),
        "last_name": R("lastName"),
        "full_name": full_name,  # generated column (evo_schemas.sql:159)
        "register_name": R("registerName"),
        "document": R("document"),
        "gender": R("gender"),
        "birth_date": R("birthDate").try_cast("date"),
        "email": _first_contact((3, 4)),  # email types (:142-145)
        "cellphone": _first_contact((1, 2)),
        "address": R("address"),
        # COALESCE alternate keys (P3, :150):
        "address_number": F.coalesce(R("addressNumber"), R("number")),
        "neighborhood": R("neighborhood"),
        "city": R("city"),
        "state": R("state"),
        "zip_code": R("zipCode"),
        "access_card_number": R("accessCardNumber"),
        "access_blocked": F.coalesce(safe_bool(R("accessBlocked")), F.lit(False)),
        "blocked_reason": R("blockedReason"),
        "status": R("status"),
        "membership_status": R("membershipStatus"),
        "penalized": F.coalesce(safe_bool(R("penalized")), F.lit(False)),
        "total_fit_coins": R("totalFitCoins").try_cast("decimal(15,2)"),
        "register_date": R("registerDate").try_cast("timestamp"),
        "conversion_date": R("conversionDate").try_cast("timestamp"),
        "last_access_date": R("lastAccessDate").try_cast("timestamp"),
        "update_date": R("updateDate").try_cast("timestamp"),
        "photo": F.coalesce(R("photo"), R("photoUrl")),  # (:168)
        "gympass_id": R("gympassId"),
        "code_totalpass": R("codeTotalpass"),
        "user_id_gurupass": R("userIdGurupass"),
        "personal_trainer": F.coalesce(safe_bool(R("personalTrainer")), F.lit(False)),
        # flat-or-nested employee refs (P2/P3, :177-182):
        "consultant_employee_id": F.coalesce(
            R("idEmployeeConsultant"), R("employeeConsultant").getField("idEmployee")
        ),
        "instructor_employee_id": F.coalesce(
            R("idEmployeeInstructor"), R("employeeInstructor").getField("idEmployee")
        ),
        "member_migration_id": F.coalesce(R("memberMigrationId"), R("idMemberMigration")),
    }


def _membership_columns() -> dict[str, Column]:
    x = F.col("x")
    return {
        "member_membership_id": x.getField("idMemberMembership"),
        "membership_id": x.getField("idMembership"),
        "membership_name": x.getField("membershipName"),
        "sale_id": x.getField("idSale"),
        "sale_date": x.getField("saleDate").try_cast("timestamp"),
        "start_date": x.getField("startDate").try_cast("timestamp"),
        "end_date": x.getField("endDate").try_cast("timestamp"),
        "cancel_date": x.getField("cancelDate").try_cast("timestamp"),
        "membership_status": x.getField("membershipStatus"),
        "value_next_month": x.getField("valueNextMonth").try_cast("decimal(15,2)"),
        "original_value": x.getField("originalValue").try_cast("decimal(15,2)"),
        "next_charge": x.getField("nextCharge").try_cast("timestamp"),
        "category_membership_id": x.getField("idCategoryMembership"),
        "num_members": x.getField("numMembers"),
        "fl_allow_locker": x.getField("flAllowLocker"),
        "signed_terms": x.getField("signedTerms"),
        "limitless": x.getField("limitless"),
        "weekly_limit": x.getField("weeklyLimit"),
        "concluded_sessions": x.getField("concludedSessions"),
        "pending_sessions": x.getField("pendingSessions"),
    }


def _contact_columns() -> dict[str, Column]:
    x = F.col("x")
    return {
        "phone_id": x.getField("idPhone"),
        "contact_type_id": x.getField("idContactType"),
        "type_description": x.getField("typeDescription"),
        "ddi": x.getField("ddi"),
        "description": x.getField("description"),
    }


register_spec(
    EntitySpec(
        name="evo_members",
        source="evo",
        entity="members",
        stg_key=("idMember",),
        core_key=("member_id",),
        dedupe_order="updateDate",
        payload_schema=MEMBERS_SCHEMA,
        columns=_members_columns,
        children=(
            ChildSpec(
                name="evo_member_memberships",
                array_col="memberships",
                parent_cols={"member_id": "member_id"},
                columns=_membership_columns,
                key=("member_id", "member_membership_id"),
                # Incremental runs update only status + value_next_month
                # (normalize_evo_members_v2.py:225-230).
                merge_mode=MergeMode.UPDATE_SUBSET,
                update_subset=("membership_status", "value_next_month"),
            ),
            ChildSpec(
                name="evo_member_contacts",
                array_col="contacts",
                parent_cols={"member_id": "member_id"},
                columns=_contact_columns,
                key=("member_id", "phone_id"),
            ),
        ),
    )
)


# ---------------------------------------------------------------------------
# Sales
# ---------------------------------------------------------------------------

_SALE_ITEM = _struct(
    _f("idSaleItem", T.LongType()),
    _f("description"),
    _f("item"),
    _f("itemValue", T.StringType()),
    _f("saleValue", T.StringType()),
    _f("quantity", T.IntegerType()),
    _f("discount", T.StringType()),
    _f("tax", T.StringType()),
    _f("valueNextMonth", T.StringType()),
    _f("idMembership", T.LongType()),
    _f("idMemberMembership", T.LongType()),
    _f("idProduct", T.LongType()),
    _f("idService", T.LongType()),
    _f("membershipStartDate"),
    _f("numMembers", T.IntegerType()),
    _f("voucher"),
    _f("flReceiptOnly", T.BooleanType()),
    _f("flSwimming", T.BooleanType()),
    _f("saleItemMigrationId"),
)

_RECEIVABLE = _struct(
    _f("idReceivable", T.LongType()),
    _f("registrationDate"),
    _f("dueDate"),
    _f("receivingDate"),
    _f("cancellationDate"),
    _f("updateDate"),
    _f("amount", T.StringType()),
    _f("ammountPaid", T.StringType()),  # sic — normalize_evo_sales_v2.py:333
    _f("status", _struct(_f("id", T.IntegerType()), _f("name"))),
    _f("currentInstallment", T.IntegerType()),
    _f("totalInstallments", T.IntegerType()),
    _f("paymentType", _struct(_f("idPaymentType", T.IntegerType()), _f("name"))),
    _f("authorization"),
    _f("tid"),
    _f("nsu"),
    _f("cardFlag"),
)

SALES_SCHEMA = _struct(
    _f("idSale", T.LongType()),
    _f("idMember", T.LongType()),
    _f("idProspect", T.LongType()),
    _f("idEmployeeSale", T.LongType()),
    _f("nameEmployeeSale"),
    _f("idPersonal", T.LongType()),
    _f("idBranch", T.LongType()),
    _f("saleDate"),
    _f("saleDateServer"),
    _f("updateDate"),
    _f("saleSource", T.IntegerType()),
    _f("observations"),
    _f("idSaleRecurrency", T.LongType()),
    _f("removed", T.BooleanType()),
    _f("removalDate"),
    _f("saleMigrationId"),
    _f("cartToken"),
    _f("saleItens", T.ArrayType(_SALE_ITEM)),  # misspelled source key (:277)
    _f("receivables", T.ArrayType(_RECEIVABLE)),
)


def _sales_columns() -> dict[str, Column]:
    return {
        "sale_id": R("idSale"),
        "member_id": R("idMember"),
        "prospect_id": R("idProspect"),
        "employee_sale_id": R("idEmployeeSale"),
        "employee_sale_name": R("nameEmployeeSale"),
        "personal_id": R("idPersonal"),
        "branch_id": R("idBranch"),
        "sale_date": R("saleDate").try_cast("timestamp"),
        "sale_date_server": R("saleDateServer").try_cast("timestamp"),
        "update_date": R("updateDate").try_cast("timestamp"),
        "sale_source": R("saleSource"),
        "observations": R("observations"),
        "sale_recurrency_id": R("idSaleRecurrency"),
        "removed": F.coalesce(safe_bool(R("removed")), F.lit(False)),
        "removal_date": R("removalDate").try_cast("timestamp"),
        "sale_migration_id": R("saleMigrationId"),
        "cart_token": R("cartToken"),
    }


def _sale_item_columns() -> dict[str, Column]:
    x = F.col("x")
    return {
        "sale_item_id": x.getField("idSaleItem"),
        "description": x.getField("description"),
        "item": x.getField("item"),
        "item_value": x.getField("itemValue").try_cast("decimal(15,2)"),
        "sale_value": x.getField("saleValue").try_cast("decimal(15,2)"),
        "quantity": x.getField("quantity"),
        "discount": x.getField("discount").try_cast("decimal(15,2)"),
        "tax": x.getField("tax").try_cast("decimal(15,2)"),
        "value_next_month": x.getField("valueNextMonth").try_cast("decimal(15,2)"),
        "membership_id": x.getField("idMembership"),
        "member_membership_id": x.getField("idMemberMembership"),
        "product_id": x.getField("idProduct"),
        "service_id": x.getField("idService"),
        "membership_start_date": x.getField("membershipStartDate").try_cast("timestamp"),
        "num_members": x.getField("numMembers"),
        "voucher": x.getField("voucher"),
        "fl_receipt_only": x.getField("flReceiptOnly"),
        "fl_swimming": x.getField("flSwimming"),
        "sale_item_migration_id": x.getField("saleItemMigrationId"),
    }


def _receivable_columns() -> dict[str, Column]:
    x = F.col("x")
    return {
        "receivable_id": x.getField("idReceivable"),
        "registration_date": x.getField("registrationDate").try_cast("timestamp"),
        "due_date": x.getField("dueDate").try_cast("timestamp"),
        "receiving_date": x.getField("receivingDate").try_cast("timestamp"),
        "cancellation_date": x.getField("cancellationDate").try_cast("timestamp"),
        "update_date": x.getField("updateDate").try_cast("timestamp"),
        "amount": x.getField("amount").try_cast("decimal(15,2)"),
        "amount_paid": x.getField("ammountPaid").try_cast("decimal(15,2)"),
        # 2-level nested projections (P2, normalize_evo_sales_v2.py:334-339):
        "status_id": x.getField("status").getField("id"),
        "status_name": x.getField("status").getField("name"),
        "current_installment": x.getField("currentInstallment"),
        "total_installments": x.getField("totalInstallments"),
        "payment_type_id": x.getField("paymentType").getField("idPaymentType"),
        "payment_type_name": x.getField("paymentType").getField("name"),
        "authorization": x.getField("authorization"),
        "tid": x.getField("tid"),
        "nsu": x.getField("nsu"),
        "card_flag": x.getField("cardFlag"),
    }


register_spec(
    EntitySpec(
        name="evo_sales",
        source="evo",
        entity="sales",
        stg_key=("idSale",),
        core_key=("sale_id",),
        dedupe_order="updateDate",
        payload_schema=SALES_SCHEMA,
        columns=_sales_columns,
        children=(
            ChildSpec(
                name="evo_sale_items",
                array_col="saleItens",
                parent_cols={"sale_id": "sale_id"},
                columns=_sale_item_columns,
                key=("sale_id", "sale_item_id"),
            ),
            ChildSpec(
                name="evo_receivables",
                array_col="receivables",
                parent_cols={"sale_id": "sale_id"},
                columns=_receivable_columns,
                key=("sale_id", "receivable_id"),
            ),
        ),
    )
)


# ---------------------------------------------------------------------------
# Entries (high-volume, synthetic key, year-partitioned)
# ---------------------------------------------------------------------------

ENTRIES_SCHEMA = _struct(
    _f("date"),
    _f("dateTurn"),
    _f("timeZone"),
    _f("idMember", T.LongType()),
    _f("nameMember"),
    _f("idProspect", T.LongType()),
    _f("nameProspect"),
    _f("idEmployee", T.LongType()),
    _f("nameEmployee"),
    _f("idBranch", T.LongType()),
    _f("entryType"),
    _f("entryAction"),
    _f("device"),
    _f("blockReason"),
    _f("releasesByID", T.LongType()),
    _f("idMigration"),
)


def _entries_key() -> dict[str, Column]:
    return {
        "entry_id": entry_id_expr(
            R("date"), R("idMember"), R("idProspect"), R("idEmployee"),
            R("idBranch"), R("device"), R("entryAction"),
        )
    }


def _entries_columns() -> dict[str, Column]:
    entry_ts = R("date").try_cast("timestamp")
    return {
        "entry_date": entry_ts,
        "entry_year": F.year(entry_ts),  # RANGE-partition analog (evo_schemas.sql:114-143)
        "date_turn": R("dateTurn").try_cast("timestamp"),
        "time_zone": R("timeZone"),
        "member_id": R("idMember"),
        "member_name": R("nameMember"),
        "prospect_id": R("idProspect"),
        "prospect_name": R("nameProspect"),
        "employee_id": R("idEmployee"),
        "employee_name": R("nameEmployee"),
        "branch_id": R("idBranch"),
        "entry_type": R("entryType"),
        "entry_action": R("entryAction"),
        "device": R("device"),
        "block_reason": R("blockReason"),
        "releases_by_id": R("releasesByID"),
        "migration_id": R("idMigration"),
    }


register_spec(
    EntitySpec(
        name="evo_entries",
        source="evo",
        entity="entries",
        stg_key=("entry_id",),
        core_key=("entry_id", "entry_year"),
        dedupe_order="_loaded_at",
        payload_schema=ENTRIES_SCHEMA,
        columns=_entries_columns,
        derived_key=_entries_key,
        partition_by=("entry_year",),
        required_fields=("date",),  # rows without date dropped (loader:233-235)
    )
)


# ---------------------------------------------------------------------------
# Prospects
# ---------------------------------------------------------------------------

PROSPECTS_SCHEMA = _struct(
    _f("idProspect", T.LongType()),
    # String-typed on purpose (P11): the API sometimes sends "2" for 2 —
    # from_json with LongType would NULL it, while ->>::BIGINT in the
    # reference coerces. String + try_cast matches the reference.
    _f("idBranch"),
    _f("branchName"),
    _f("firstName"),
    _f("lastName"),
    _f("document"),
    _f("email"),
    _f("cellphone"),
    _f("gender"),
    _f("birthDate"),
    _f("address"),
    _f("number"),
    _f("city"),
    _f("state"),
    _f("zipCode"),
    _f("signupType"),
    _f("mktChannel"),
    _f("currentStep"),
    _f("gympassId"),
    _f("conversionDate"),
    _f("idMember", T.LongType()),
    _f("registerDate"),
    _f(
        "financiallyResponsibles",
        T.ArrayType(_struct(_f("name"), _f("cpf"), _f("financialResponsible", T.BooleanType()))),
    ),
    _f("interests", T.ArrayType(T.StringType())),
    _f("notes"),
    _f("temperature"),
)


def _prospects_columns() -> dict[str, Column]:
    # P4: custom_fields object only when interests present
    # (normalize_evo_prospects.py:155-159).
    custom = F.when(
        R("interests").isNotNull(),
        F.to_json(
            F.struct(
                R("interests").alias("interests"),
                R("notes").alias("notes"),
                R("temperature").alias("temperature"),
            )
        ),
    )
    first_fr = R("financiallyResponsibles")[0]  # J3 positional (:150-152)
    return {
        "prospect_id": R("idProspect"),
        "branch_id": R("idBranch").try_cast("long"),
        "branch_name": R("branchName"),
        "first_name": R("firstName"),
        "last_name": R("lastName"),
        "document": R("document"),
        "email": R("email"),
        "cellphone": R("cellphone"),
        "gender": R("gender"),
        "birth_date": R("birthDate").try_cast("date"),
        "address": R("address"),
        "address_number": R("number"),
        "city": R("city"),
        "state": R("state"),
        "zip_code": R("zipCode"),
        "signup_type": R("signupType"),
        "mkt_channel": R("mktChannel"),
        "current_step": R("currentStep"),
        "gympass_id": R("gympassId"),
        "conversion_date": R("conversionDate").try_cast("timestamp"),
        "member_id": R("idMember"),
        "is_converted": R("idMember").isNotNull(),  # generated col (evo_schemas.sql:179)
        "register_date": R("registerDate").try_cast("timestamp"),
        "financial_responsible_name": first_fr.getField("name"),
        "financial_responsible_cpf": first_fr.getField("cpf"),
        "custom_fields": custom,
    }


register_spec(
    EntitySpec(
        name="evo_prospects",
        source="evo",
        entity="prospects",
        stg_key=("idProspect",),
        core_key=("prospect_id",),
        dedupe_order="_loaded_at",
        payload_schema=PROSPECTS_SCHEMA,
        columns=_prospects_columns,
    )
)
