"""Declared StructTypes for every boundary contract (FIXTURES.md layer A).

The reference inferred schemas at ingest and enforced a column contract
by pad-then-project (reference: config.py:38-50, utils.py:35-41); here
every boundary has an explicit StructType and the contract is a shared
constant (the reference duplicated its 14-column list in two files —
bulk_fetch.py:140-151 and incremental_fetch.py:110-119).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- API payload contracts (reference config.py:38-50) ---------------------

DATA_CAPTURE_COLUMNS = (
    "productionRecordId", "orderLabel", "masterTemplateId", "unitProcedureId",
    "operationId", "phaseId", "title", "value", "userName", "dateTime",
    "actionTaken", "dataCaptureName",
)

BATCH_RECORD_COLUMNS = ("lotNumber", "productId", "productName", "status")

STRUCTURE_COLUMNS = (
    "title", "level", "masterTemplateId", "unitProcedureId", "operationId",
    "phaseId",
)

DATA_CAPTURES_SCHEMA = T.StructType([
    T.StructField("productionRecordId", T.LongType()),
    T.StructField("orderLabel", T.StringType()),
    T.StructField("masterTemplateId", T.LongType()),
    T.StructField("unitProcedureId", T.LongType()),
    T.StructField("operationId", T.LongType()),
    T.StructField("phaseId", T.LongType()),
    T.StructField("title", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("userName", T.StringType()),
    T.StructField("dateTime", T.StringType()),
    T.StructField("actionTaken", T.StringType()),
    T.StructField("dataCaptureName", T.StringType()),
    T.StructField("current", T.BooleanType()),
    T.StructField("iterationNumber", T.IntegerType()),
])

BATCH_RECORDS_SCHEMA = T.StructType([
    T.StructField("lotNumber", T.StringType()),
    T.StructField("productId", T.StringType()),
    T.StructField("productName", T.StringType()),
    T.StructField("status", T.StringType()),
])

STRUCTURES_SCHEMA = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("level", T.StringType()),
    T.StructField("masterTemplateId", T.LongType()),
    T.StructField("unitProcedureId", T.LongType()),
    T.StructField("operationId", T.LongType()),
    T.StructField("phaseId", T.LongType()),
])

# --- The 14-column exchange contract (reference bulk_fetch.py:140-151) -----

OUTPUT_COLUMNS = (
    "Master Template Name", "Lot Number", "Product ID", "Unit", "Operation",
    "Phase", "Data Capture Time", "Production Record Status",
    "Structure Label", "Description", "Input Data Value", "Performed By",
    "Action Performed", "Captured Data Type",
)

LOT_CSV_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in OUTPUT_COLUMNS]
)

# --- Warehouse tables (reference schema.py:6-51) ----------------------------

LOTS_SCHEMA = T.StructType([
    T.StructField("lot_number", T.StringType(), False),
    T.StructField("product_id", T.StringType()),
    T.StructField("product_name", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("first_loaded", T.TimestampType()),
    T.StructField("last_updated", T.TimestampType()),
])

LOT_DATA_SCHEMA = T.StructType([
    T.StructField("lot_number", T.StringType(), False),
    T.StructField("master_template_name", T.StringType()),
    T.StructField("unit", T.StringType()),
    T.StructField("operation", T.StringType()),
    T.StructField("phase", T.StringType()),
    T.StructField("data_capture_time", T.TimestampType()),
    T.StructField("structure_label", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("input_data_value", T.StringType()),
    T.StructField("performed_by", T.StringType()),
    T.StructField("action_performed", T.StringType()),
    T.StructField("captured_data_type", T.StringType()),
    T.StructField("data_hash", T.StringType()),
    T.StructField("created_at", T.TimestampType()),
    T.StructField("updated_at", T.TimestampType()),
])

PROCESSING_HISTORY_SCHEMA = T.StructType([
    T.StructField("filename", T.StringType()),
    T.StructField("lot_number", T.StringType()),
    T.StructField("process_type", T.StringType()),
    T.StructField("processed_at", T.TimestampType()),
    T.StructField("record_count", T.IntegerType()),
    T.StructField("source_directory", T.StringType()),
    T.StructField("target_directory", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("message", T.StringType()),
])

# --- State / audit (reference status_tracker.py:30-32, incremental_fetch.py:140)

STATUS_LOG_SCHEMA = T.StructType([
    T.StructField("production_record_id", T.LongType()),
    T.StructField("lot_number", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("reason", T.StringType()),
])

WINDOW_LOG_SCHEMA = T.StructType([
    T.StructField("start_datetime", T.StringType()),
    T.StructField("end_datetime", T.StringType()),
    T.StructField("start_epoch", T.LongType()),
    T.StructField("end_epoch", T.LongType()),
])
