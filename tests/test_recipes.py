"""Golden tests: the two ETL recipes vs a faithful pandas re-execution of
the reference's transform chain (reference: src/main.py:108-376), plus
grain checks and the reporting view stacks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cancer_survival_etl_spark.plans import (
    benchmarking_rank,
    benchmarking_standards,
    index_report,
    process_adult4,
    process_index,
    processed_adult4,
)
from cancer_survival_etl_spark.schemas import (
    ADULT4_GRAIN,
    INDEX_GRAIN,
    assert_grain,
)

from fixtures import TARGETS, adult_sheet, index_sheet


def pandas_process_index(df_index: pd.DataFrame, targets) -> pd.DataFrame:
    """Reference chain re-executed in pandas (src/main.py:108-212),
    minus the upload/date_upload step."""
    df_index = df_index[
        (df_index["Geography type"] == "Cancer Alliance")
        | (df_index["Geography code"].isin(targets))
    ].copy()
    df_index["area_core"] = df_index["Geography code"].isin(targets)
    df_index["data_substituted"] = np.where(
        df_index["Substituted by Other Geography"].isnull(), False, True
    )
    dupe = df_index[
        (df_index["Cancer site"] == "Breast")
        & (df_index["Gender"] == "Female")
        & (df_index["Age at diagnosis"] == "All ages")
    ].copy()
    dupe["Gender"] = "Persons"
    df_index = pd.concat([df_index, dupe])
    df_index = df_index[
        ~(
            (df_index["Cancer site"] == "Breast")
            & (df_index["Gender"] == "Female")
            & (df_index["Age at diagnosis"] == "All ages")
        )
    ]
    df_index["Cancer site"] = df_index["Cancer site"].str.replace(
        "Index", "Overall"
    )
    df_index = df_index[~(df_index["Cancer site"] == "Other")]
    rename = {
        "Geography code": "AREA_CODE",
        "Geography name": "AREA_NAME",
        "area_core": "IS_AREA_CORE",
        "Cancer site": "CANCER_SITE",
        "Gender": "GENDER",
        "Age at diagnosis": "AGE_AT_DIAGNOSIS",
        "Standardisation type": "STANDARDISATION_TYPE",
        "Diagnosis year": "YEAR_OF_DIAGNOSIS",
        "Years since diagnosis": "YEARS_SINCE_DIAGNOSIS",
        "Patient numbers": "PATIENT_NUMBERS",
        "Survival (%)": "SURVIVAL_PERCENT",
        "Lower CI": "LOWER_CI",
        "Upper CI": "UPPER_CI",
        "Precision": "PRECISION",
        "Standard error": "STANDARD_ERROR",
        "data_substituted": "IS_DATA_SUBTITUTED",
    }
    return df_index[list(rename)].rename(columns=rename).reset_index(drop=True)


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def index_out(spark):
    raw = spark.createDataFrame(index_sheet())
    return process_index(raw, TARGETS)


@pytest.fixture(scope="module")
def adult4_out(spark):
    raw = spark.createDataFrame(adult_sheet())
    return process_adult4(
        raw, TARGETS, diagnosis_window="2016-2020", snapshot_date="March 2023"
    )


def test_process_index_matches_pandas_reference(spark, index_out):
    expected = pandas_process_index(index_sheet(), TARGETS)
    got = index_out.toPandas()
    assert sorted(got.columns) == sorted(expected.columns)
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(expected), check_dtype=False
    )


def test_process_index_grain(index_out):
    assert_grain(index_out, INDEX_GRAIN)


def test_process_adult4_shape_and_semantics(adult4_out):
    pdf = adult4_out.toPandas()
    # melt doubled the rows relative to id-grain; both metrics present
    assert set(pdf["SURVIVAL_METRIC"]) == {"Net Survival", "Overall Survival"}
    # bracket extraction + prefix strip
    assert set(pdf["STANDARDISATION_TYPE"]) == {
        "Age-standardised",
        "Non-standardised",
    }
    subcats = set(pdf["STANDARDISATION_TYPE_SUBCATEGORY"].dropna())
    assert subcats == {"5 age groups"}
    assert (
        pdf.loc[
            pdf["STANDARDISATION_TYPE"] == "Non-standardised",
            "STANDARDISATION_TYPE_SUBCATEGORY",
        ]
        .isna()
        .all()
    )
    # gender-exclusive sites generalized: Persons rows exist for all four
    for site in ["Larynx", "Prostate", "Cervix", "Ovary"]:
        assert (
            (pdf["CANCER_SITE"] == site) & (pdf["GENDER"] == "Persons")
        ).any(), site
    # national breast Persons exists; non-national breast stays Female-only
    breast = pdf[pdf["CANCER_SITE"] == "Breast"]
    assert (
        (breast["AREA_CODE"] == "E92000001") & (breast["GENDER"] == "Persons")
    ).any()
    assert not (
        (breast["AREA_CODE"] != "E92000001") & (breast["GENDER"] == "Persons")
    ).any()
    # stamps
    assert (pdf["DATE_DIAGNOSIS_WINDOW"] == "2016-2020").all()
    assert (pdf["DATE_SNAPSHOT"] == "March 2023").all()
    # ICB rows (non-core, non-CA) filtered out
    assert not (pdf["AREA_TYPE"] == "ICB").any()


def test_process_adult4_grain(adult4_out):
    assert_grain(adult4_out, ADULT4_GRAIN)


def test_index_report_union_and_sort_keys(spark, index_out):
    rep = index_report(index_out).toPandas()
    best = rep[rep["AREA_NAME"] == "Best Non-NCL Cancer Alliance"]
    assert len(best) > 0
    assert (best["AREA_CODE"] == "X").all()
    assert best["PATIENT_NUMBERS"].isna().all()
    core = rep[rep["AREA_NAME"] != "Best Non-NCL Cancer Alliance"]
    assert core["IS_AREA_CORE"].all()
    assert set(rep["SORT_SITE"]) == {1, 2}
    assert (rep.loc[rep["CANCER_SITE"] == "Overall", "SORT_SITE"] == 1).all()


def test_benchmarking_rank_quartiles(spark, adult4_out):
    br = benchmarking_rank(adult4_out).toPandas()
    # one row per JOIN_KEY
    assert br["JOIN_KEY"].is_unique
    # NCL present with rank → quartile labels from the CASE domain
    labeled = br.dropna(subset=["NCL_QUARTILE"])
    assert set(labeled["NCL_QUARTILE"]) <= {"-", "1st", "2nd", "3rd", "4th"}
    # groups where NCL had null survival → NULL quartile via left-join miss
    missing = br[br["RANK_CA"].isna()]
    assert missing["NCL_QUARTILE"].isna().all()
    # published layer renames
    pub = benchmarking_rank(adult4_out, published=True)
    assert pub.columns == [
        "JOIN_KEY",
        "Cancer_Site",
        "Survival_Per",
        "Rank_CA",
        "Rank_Denominator",
        "Quartile",
    ]


def test_benchmarking_standards_pivot(spark, adult4_out):
    bs = benchmarking_standards(adult4_out).toPandas()
    assert sorted(bs.columns) == sorted(
        ["JOIN_KEY", "ENGLAND", "LONDON", "BEST", "WORST", "Q1", "Q2", "Q3"]
    )
    ok = bs.dropna()
    assert len(ok) > 0
    assert (ok["BEST"] >= ok["WORST"]).all()
    assert (ok["BEST"] >= ok["Q3"]).all()
    assert (ok["Q3"] >= ok["Q1"]).all()


def test_processed_adult4_filter(spark, adult4_out):
    pa = processed_adult4(adult4_out).toPandas()
    assert pa["IS_AREA_CORE"].all()
    non_ncl = pa[pa["AREA_CODE"] != "E56000027"]
    assert (non_ncl["STANDARDISATION_TYPE"] == "Age-standardised").all()
    assert (non_ncl["SURVIVAL_METRIC"] == "Net Survival").all()
    assert "JOIN_KEY" in pa.columns and "SORT_GENDER" in pa.columns


def test_sql_view_layer(spark, index_out, adult4_out):
    """The registered view stack answers plain spark.sql queries with the
    same results as the DataFrame plans (the reference's dashboard-facing
    surface — layered Snowflake views)."""
    from cancer_survival_etl_spark.plans.views import register_reporting_views

    names = register_reporting_views(spark, index_out, adult4_out)
    assert "published_rank" in names and "reporting_index" in names

    via_sql = spark.sql(
        "SELECT JOIN_KEY, Quartile FROM published_rank ORDER BY JOIN_KEY"
    ).collect()
    via_df = (
        benchmarking_rank(adult4_out, published=True)
        .select("JOIN_KEY", "Quartile")
        .orderBy("JOIN_KEY")
        .collect()
    )
    assert via_sql == via_df

    # views compose: a dashboard-style ad-hoc join over two stacks
    n = spark.sql(
        """SELECT count(*) AS n
           FROM published_rank r
           JOIN reporting_benchmarking_standard b USING (JOIN_KEY)"""
    ).first()["n"]
    assert n > 0


def test_run_pipeline_end_to_end(spark, tmp_path):
    """The main() analog: enumerate → route by prefix → recipe → sink,
    with injected sheet loading (no Excel engine needed) — both
    destinations produced, unmatched files warned, window parsed from
    the adult filename."""
    import warnings

    from cancer_survival_etl_spark.pipeline import run_pipeline
    from cancer_survival_etl_spark.sources.excel import pandas_to_df

    for name in ["Index_2023.xlsx", "adult_2016_2020.xlsx", "stray.xlsx"]:
        (tmp_path / name).touch()

    sheets = {"Table 5": index_sheet(), "Table 4": adult_sheet()}

    def load(sp, path, sheet_name, skiprows):
        return pandas_to_df(sp, sheets[sheet_name])

    sunk = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = run_pipeline(
            spark,
            str(tmp_path),
            TARGETS,
            sink=lambda df, table: sunk.setdefault(table, df),
            load_sheet=load,
            snapshot_date="March 2023",
        )
    assert set(out) == {"INDEX", "ADULT_4"} == set(sunk)
    assert any("stray.xlsx" in str(x.message) for x in w)
    adult = out["ADULT_4"].toPandas()
    assert (adult["DATE_DIAGNOSIS_WINDOW"] == "2016-2020").all()
    assert (adult["DATE_SNAPSHOT"] == "March 2023").all()
    assert out["INDEX"].count() > 0
