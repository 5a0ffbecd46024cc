"""CSV quoting divergence (SURVEY.md §7.4.2).

The reference splits CSV lines with a naive ``line.split(",")``
(``Operators.java:174``, ``:263``) that mis-parses its own bundled
Traffic_Signs data — quoted fields like ``"16"" X 42""`` (a Size_ value
containing escaped quotes) and quoted fields containing commas both
shatter into extra columns.  We declare correct RFC-4180 parsing as the
intended behavior: Spark's CSV reader with quote/escape handling.
"""

from __future__ import annotations

from real_time_stream_processing_engine_spark.sources.readers import (
    TRAFFIC_SIGNS_SCHEMA,
    read_traffic_signs_csv,
)

HEADER = (
    "X,Y,OBJECTID,Sign_Type,Size_,Supplement,Sign_Post,Year_Insta,Category,"
    "Notes,MUTCD,Ownership,FACILITYID,Schools,Location_Adjusted,"
    "Replacement_Zone,Sign_Text,Set_ID,FieldVerifiedDate"
)
# row 2 of the reference's traffic_signs.csv shape: quoted size with
# escaped inches-quotes, and a quoted note containing a comma
ROW = (
    '-9822722.35,4887968.51,1,Streetname - Mast Arm,"16"" X 42""", ,'
    'Traffic Signal Mast Arm,2012,Streetname,"see note, important",D3-1,'
    "Champaign,1, ,AERIAL,L,Main St,5,1/2/2013"
)


def test_quoted_csv_parses_to_19_columns(spark, tmp_path):
    p = tmp_path / "signs.csv"
    p.write_text(HEADER + "\n" + ROW + "\n")
    df = read_traffic_signs_csv(spark, str(p))
    assert len(df.columns) == len(TRAFFIC_SIGNS_SCHEMA.fields) == 19
    row = df.collect()[0]
    # the two quoting hazards parse intact (the reference shatters both)
    assert row["Size_"] == '16" X 42"'
    assert row["Notes"] == "see note, important"
    # neighbours are not displaced
    assert row["Sign_Post"] == "Traffic Signal Mast Arm"
    assert row["Set_ID"] == 5
    assert row["OBJECTID"] == 1


def test_naive_split_would_shatter(spark):
    # documents WHY the divergence exists: the reference's split(",")
    # shatters this row into more than its 19 columns
    assert len(ROW.split(",")) > 19
