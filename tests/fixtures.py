"""Synthetic Excel-shaped fixtures per FIXTURES.md §1-2."""

from __future__ import annotations

import numpy as np
import pandas as pd

TARGETS = ["E56000027", "E40000003", "E92000001"]

CA_CODES = [f"E560000{i:02d}" for i in range(10, 19)]  # 9 non-NCL CAs


def index_sheet() -> pd.DataFrame:
    """Raw 'Table 5' shape (FIXTURES.md §1)."""
    rows = []
    geos = (
        [("Cancer Alliance", c, f"CA {c}") for c in CA_CODES]
        + [
            ("Cancer Alliance", "E56000027", "NCL"),
            ("Region", "E40000003", "London"),
            ("Country", "E92000001", "England"),
            ("ICB", "E54000001", "Some ICB"),  # filtered out
        ]
    )
    sites = ["Index", "Breast", "Other", "Lung", "Colorectal"]
    rng = np.random.RandomState(7)
    for gtype, gcode, gname in geos:
        for site in sites:
            genders = ["Female"] if site == "Breast" else ["Persons"]
            for gender in genders:
                for age in ["All ages", "15-44"]:
                    for year in [2019, 2020]:
                        for ysd in [1, 5]:
                            surv = (
                                None
                                if rng.rand() < 0.08
                                else round(float(rng.rand() * 60 + 35), 1)
                            )
                            rows.append(
                                {
                                    "Geography type": gtype,
                                    "Geography code": gcode,
                                    "Geography name": gname,
                                    "Cancer site": site,
                                    "Gender": gender,
                                    "Age at diagnosis": age,
                                    "Standardisation type": "Age-standardised",
                                    "Diagnosis year": year,
                                    "Years since diagnosis": ysd,
                                    "Patient numbers": int(rng.randint(20, 500)),
                                    "Survival (%)": surv,
                                    "Lower CI": surv and surv - 2.0,
                                    "Upper CI": surv and surv + 2.0,
                                    "Precision": 0.5,
                                    "Standard error": 1.1,
                                    "Substituted by Other Geography": (
                                        "E92000001" if rng.rand() < 0.1 else None
                                    ),
                                }
                            )
    return pd.DataFrame(rows)


def adult_sheet() -> pd.DataFrame:
    """Raw 'Table 4' shape (FIXTURES.md §2)."""
    rows = []
    geos = (
        [("Cancer Alliance", c, f"CA {c}") for c in CA_CODES]
        + [
            ("Cancer Alliance", "E56000027", "NCL"),
            ("Region", "E40000003", "London"),
            ("Country", "E92000001", "England"),
            ("ICB", "E54000001", "Some ICB"),
        ]
    )
    sites = ["Breast", "Larynx", "Prostate", "Cervix", "Ovary", "Lung"]
    site_gender = {
        "Breast": ["Female"],
        "Larynx": ["Male"],
        "Prostate": ["Male"],
        "Cervix": ["Female"],
        "Ovary": ["Female"],
        "Lung": ["Persons", "Male", "Female"],
    }
    rng = np.random.RandomState(11)
    for gtype, gcode, gname in geos:
        for site in sites:
            for gender in site_gender[site]:
                for std in ["Age-standardised (5 age groups)", "Non-standardised"]:
                    for ysd in [1, 5]:
                        net = (
                            None
                            if rng.rand() < 0.08
                            else round(float(rng.rand() * 60 + 35), 1)
                        )
                        rows.append(
                            {
                                "Geography type": gtype,
                                "Geography name": gname,
                                "Geography code": gcode,
                                "Cancer site": site,
                                "Gender": gender,
                                "Standardisation type": std,
                                "Years since diagnosis": ysd,
                                "Patients": int(rng.randint(20, 500)),
                                "Net survival (%)": net,
                                "Overall survival (%)": (
                                    None if rng.rand() < 0.2 else
                                    round(float(rng.rand() * 60 + 35), 1)
                                ),
                            }
                        )
    df = pd.DataFrame(rows)
    # normalize the bracketed std label the pipeline strips
    df.loc[df["Standardisation type"].str.startswith("Age"), "Standardisation type"] = (
        "Age-standardised (5 age groups)"
    )
    return df
