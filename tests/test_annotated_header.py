"""Byte-exact golden tests for the annotated-CSV header
(sinks/annotated_header.py vs reference DatasetUtilities.py:420-534).

Expected strings are hand-derived from the reference source line by line,
including its quirks (trailing spaces, comma-quoting, the compact-block
MethodLink chop)."""

from __future__ import annotations

from h2outility_spark.sinks import annotated_header as ah

SITE = {
    "code": "RB_KF_C",
    "name": "Knowlton Fork Climate",
    "latitude": 40.5,
    "longitude": -111.8,
    "lat_lon_datum": "NAD83",
    "elevation_m": 2250.0,
    "elevation_datum": "NGVD29",
    "state": "Utah",
    "county": "Salt Lake",
    "comments": None,
    "type": "Atmosphere",
}

VAR = {
    "code": "TA",
    "name": "Temperature, air",  # comma -> quoted line, no trailing space
    "value_type": "Field Observation",
    "data_type": "Average",
    "general_category": "Climate",
    "sample_medium": "Air",
    "variable_unit": {"name": "degree celsius", "type": "Temperature", "abbreviation": "degC"},
    "no_data_value": -9999.0,  # integer-like -> prints -9999
    "time_support": 15,
    "time_unit": {"name": "minute", "type": "Time", "abbreviation": "min"},
}

METHOD = {"id": 9, "description": "Vaisala sensor", "link": "http://example.org/m/"}

SOURCE = {
    "organization": "Univ",
    "description": "iUTAH GAMUT",
    "link": "http://data.org",
    "contact_name": "Jane Doe",
    "phone": "555",
    "email": "j@d.org",
    "citation": "iUTAH 2016",
}

EXPECTED_SITE = (
    "# Site Information\n"
    "# ----------------------------------\n"
    "# SiteCode: RB_KF_C\n"
    "# SiteName: Knowlton Fork Climate\n"
    "# Latitude: 40.5\n"
    "# Longitude: -111.8\n"
    "# LatLonDatum: NAD83\n"
    "# Elevation_m: 2250.0\n"
    "# ElevationDatum: NGVD29\n"
    "# State: Utah\n"
    "# County: Salt Lake\n"
    "# Comments: None\n"
    "# SiteType: Atmosphere\n"
    "#\n"
)

EXPECTED_VAR = (
    "# Variable and Method Information\n"
    "# ----------------------------------\n"
    "# VariableCode: TA \n"
    '"# VariableName: Temperature, air"\n'
    "# ValueType: Field Observation \n"
    "# DataType: Average \n"
    "# GeneralCategory: Climate \n"
    "# SampleMedium: Air \n"
    "# VariableUnitsName: degree celsius \n"
    "# VariableUnitsType: Temperature \n"
    "# VariableUnitsAbbreviation: degC \n"
    "# NoDataValue: -9999 \n"
    "# TimeSupport: 15 \n"
    "# TimeSupportUnitsAbbreviation: min \n"
    "# TimeSupportUnitsType: Time \n"
    "# TimeSupportUnitsName: minute \n"
    "# MethodDescription: Vaisala sensor \n"
    "# MethodLink: http://example.org/m \n"  # trailing '/' stripped
)

EXPECTED_SOURCE = (
    "# Source Information\n"
    "# ----------------------------------\n"
    "# Organization: Univ \n"
    "# SourceDescription: iUTAH GAMUT \n"
    "# SourceLink: http://data.org \n"
    "# ContactName: Jane Doe \n"
    "# Phone: 555 \n"
    "# Email: j@d.org \n"
    "# Citation: iUTAH 2016 \n"
)

EXPECTED_QUALS = (
    "# Qualifier Codes\n"
    "# ----------------------------------\n"
    "# e: estimated\n"
    "# s: suspect\n"
    "#\n"
)


def test_expanded_header_bytes_exact():
    got = ah.build_series_file_header(
        SITE,
        SOURCE,
        [("TA", VAR, METHOD)],
        qualifier_codes=[(1, "e", "estimated"), (2, "s", "suspect")],
    )
    want = (
        EXPECTED_SITE
        + EXPECTED_VAR
        + "#\n"
        + EXPECTED_SOURCE
        + "#\n"
        + EXPECTED_QUALS
        + "#\n"  # assembly separator even after the quals block's own '#\n'
    )
    assert got == want


def test_empty_qualifiers_still_terminates():
    got = ah.build_series_file_header(SITE, SOURCE, [("TA", VAR, METHOD)])
    assert got.endswith(EXPECTED_SOURCE + "#\n" + "#\n")
    assert "# Qualifier Codes" not in got


def test_censor_codes_block_included_when_flagged():
    got = ah.build_series_file_header(
        SITE, SOURCE, [("TA", VAR, METHOD)], has_censor_codes=True
    )
    assert (
        "# Censor Codes\n# ----------------------------------\n# nc: not censored\n#\n" in got
    )


def test_compact_block_rows_and_methodlink_chop():
    var2 = {**VAR, "name": "Relative humidity", "code": "RH"}
    m_alnum = {"id": 3, "description": "sensor A", "link": "http://x.org/a"}
    m_none = {"id": 4, "description": "sensor B", "link": None}
    got = ah.compact_variable_block([("TA", VAR, m_alnum), ("RH-1", var2, m_none)])
    lines = got.split("\n")
    assert lines[0] == "# Variable and Method Information"
    assert lines[1] == "# ----------------------------------"
    row1, row2 = lines[2], lines[3]
    # quoted pipe-joined rows with the '# ' prefix inside the quotes
    assert row1.startswith('"# Column: TA | VariableCode: TA | ')
    assert "VariableName: Temperature, air" in row1
    assert "MethodID: 3" in row1
    # NoDataValue is NOT integer-formatted in the compact block
    assert "NoDataValue: -9999.0" in row1
    # [:-2] chop: 'http://x.org/a' loses its last two chars
    assert row1.endswith('MethodLink: http://x.org"')
    # link None -> 'None' -> chopped to 'No'
    assert row2.endswith('MethodLink: No"')
    assert row2.startswith('"# Column: RH-1 | VariableCode: RH | ')
    assert got.endswith("\n")


def test_compact_link_nonalnum_last_char_quirk():
    # reference :703-706 keeps only the LAST CHAR when it's non-alnum
    m = {"id": 5, "description": "d", "link": "http://x.org/"}
    got = ah.compact_variable_block([("C", VAR, m)])
    # 'MethodLink: /' -> [:-2] chop leaves 'MethodLink:'
    assert got.split("\n")[2].endswith('MethodLink:"')
