"""Byte-exact annotated-CSV header blocks (SURVEY.md §2.1 S5).

Mirrors the reference's header byte format exactly
(``src/Utilities/DatasetUtilities.py:420-534`` assembly, ``:574-738``
section classes in /root/reference) so files produced here are
drop-in byte-compatible with files the reference wrote. The generic
key=value header in ``csv_sink.build_annotated_header`` remains for new
pipelines; THIS module is for byte-compatible migration.

Faithfully reproduced quirks (deliberate — byte parity, not taste):

* every ``# Key: value`` line in the expanded-variable and source blocks
  ends with a trailing space before the newline (``'# {}: {} \\n'``,
  DatasetUtilities.py:612,683);
* a string value containing a comma switches the line to the quoted form
  ``"# Key: value"`` WITHOUT the trailing space (:680-681);
* ``NoDataValue`` prints integer-like floats as integers (:642);
* an expanded-block MethodLink whose last char is non-alphanumeric is
  truncated by one char (:649-650); the compact block instead replaces a
  link whose last char is non-alphanumeric with JUST that last char
  (:703-706 — reference bug, reproduced);
* the compact block chops the last two chars off its final
  ``MethodLink: x`` cell (:725 — leftover from a older format, reference
  bug, reproduced);
* an empty qualifier-code list contributes nothing, but the assembly
  still appends its ``#\\n`` separator; a non-empty list ends with TWO
  ``#\\n`` lines (:464 + :534).

Inputs are plain dicts (the engine's dimension rows, e.g. from
``operators/catalog.py`` star lookups) instead of ORM objects:

  site:   code name latitude longitude lat_lon_datum elevation_m
          elevation_datum state county comments type
  var:    code name value_type data_type general_category sample_medium
          variable_unit {name type abbreviation} no_data_value
          time_support time_unit {name type abbreviation}
  method: id description link
  source: organization description link contact_name phone email citation
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Line formatters
# ---------------------------------------------------------------------------


def _fmt_expanded(title: str, value) -> str:
    """'# Key: value \\n', or the quoted no-trailing-space form when a
    string value contains a comma (DatasetUtilities.py:674-683)."""
    if isinstance(value, str):
        value = value.strip()
        if "," in value:
            return '"# {}: {}"\n'.format(title, value)
    return "# {}: {} \n".format(title, value)


def _fmt_source(title: str, value) -> str:
    """'# Key: value \\n' (DatasetUtilities.py:606-612)."""
    if isinstance(value, str):
        value = value.strip()
    return "# {}: {} \n".format(title, value)


def _fmt_compact(title: str, value) -> str:
    """'Key: value' cell of a compact row (DatasetUtilities.py:733-738)."""
    if isinstance(value, str):
        value = value.strip()
    return "{0}: {1}".format(title, value)


def _no_data(value) -> object:
    """-9999.0 prints as -9999 (DatasetUtilities.py:642)."""
    v = float(value)
    return int(v) if v.is_integer() else v


# ---------------------------------------------------------------------------
# Section blocks
# ---------------------------------------------------------------------------


def site_information(site: dict) -> str:
    """generateSiteInformation (DatasetUtilities.py:490-512)."""
    out = "# Site Information\n"
    out += "# ----------------------------------\n"
    out += "# SiteCode: " + str(site.get("code")) + "\n"
    out += "# SiteName: " + str(site.get("name")) + "\n"
    out += "# Latitude: " + str(site.get("latitude")) + "\n"
    out += "# Longitude: " + str(site.get("longitude")) + "\n"
    out += "# LatLonDatum: " + str(site.get("lat_lon_datum")) + "\n"
    out += "# Elevation_m: " + str(site.get("elevation_m")) + "\n"
    out += "# ElevationDatum: " + str(site.get("elevation_datum")) + "\n"
    out += "# State: " + str(site.get("state")) + "\n"
    out += "# County: " + str(site.get("county")) + "\n"
    out += "# Comments: " + str(site.get("comments")) + "\n"
    out += "# SiteType: " + str(site.get("type")) + "\n"
    out += "#\n"
    return out


def expanded_variable_block(var: dict, method: dict) -> str:
    """ExpandedVariableData.printToFile (DatasetUtilities.py:630-683):
    the single-series variable+method section."""
    link = method.get("link")
    link = "None" if link is None else link
    if not link[-1:].isalnum():
        link = link[:-1]
    vu = var.get("variable_unit", {})
    tu = var.get("time_unit", {})
    out = "# Variable and Method Information\n"
    out += "# ----------------------------------\n"
    out += _fmt_expanded("VariableCode", var.get("code"))
    out += _fmt_expanded("VariableName", var.get("name"))
    out += _fmt_expanded("ValueType", var.get("value_type"))
    out += _fmt_expanded("DataType", var.get("data_type"))
    out += _fmt_expanded("GeneralCategory", var.get("general_category"))
    out += _fmt_expanded("SampleMedium", var.get("sample_medium"))
    out += _fmt_expanded("VariableUnitsName", vu.get("name"))
    out += _fmt_expanded("VariableUnitsType", vu.get("type"))
    out += _fmt_expanded("VariableUnitsAbbreviation", vu.get("abbreviation"))
    out += _fmt_expanded("NoDataValue", _no_data(var.get("no_data_value")))
    out += _fmt_expanded("TimeSupport", var.get("time_support"))
    out += _fmt_expanded("TimeSupportUnitsAbbreviation", tu.get("abbreviation"))
    out += _fmt_expanded("TimeSupportUnitsType", tu.get("type"))
    out += _fmt_expanded("TimeSupportUnitsName", tu.get("name"))
    out += _fmt_expanded("MethodDescription", method.get("description"))
    out += _fmt_expanded("MethodLink", link)
    return out


def compact_variable_block(columns: list[tuple[str, dict, dict]]) -> str:
    """CompactVariableData.printToFile (DatasetUtilities.py:686-731): one
    quoted pipe-joined row per (column_name, var, method) of a multi-series
    wide export, including the reference's [:-2] MethodLink chop."""
    header = "# Variable and Method Information\n"
    header += "# ----------------------------------\n"
    rows = []
    for column_name, var, method in columns:
        link = method.get("link")
        if link is None:
            link = "None"
        else:
            link = link if link[-1:].isalnum() else link[-1:]
        vu = var.get("variable_unit", {})
        tu = var.get("time_unit", {})
        cells = [
            _fmt_compact("Column", column_name),
            _fmt_compact("VariableCode", var.get("code")),
            _fmt_compact("VariableName", var.get("name")),
            _fmt_compact("MethodID", method.get("id")),
            _fmt_compact("ValueType", var.get("value_type")),
            _fmt_compact("DataType", var.get("data_type")),
            _fmt_compact("GeneralCategory", var.get("general_category")),
            _fmt_compact("SampleMedium", var.get("sample_medium")),
            _fmt_compact("VariableUnitsName", vu.get("name")),
            _fmt_compact("VariableUnitsType", vu.get("type")),
            _fmt_compact("VariableUnitsAbbreviation", vu.get("abbreviation")),
            _fmt_compact("NoDataValue", var.get("no_data_value")),
            _fmt_compact("TimeSupport", var.get("time_support")),
            _fmt_compact("TimeSupportUnitsAbbreviation", tu.get("abbreviation")),
            _fmt_compact("TimeSupportUnitsName", tu.get("name")),
            _fmt_compact("TimeSupportUnitsType", tu.get("type")),
            _fmt_compact("MethodDescription", method.get("description")),
            _fmt_compact("MethodLink", link)[:-2],
        ]
        rows.append('"# %s"' % " | ".join(cells))
    return "%s%s\n" % (header, "\n".join(rows))


def source_information(source: dict, use_citation: bool = True) -> str:
    """SourceInfo.outputSourceInfo (DatasetUtilities.py:594-604)."""
    out = "# Source Information\n# ----------------------------------\n"
    out += _fmt_source("Organization", source.get("organization"))
    out += _fmt_source("SourceDescription", source.get("description"))
    out += _fmt_source("SourceLink", source.get("link"))
    out += _fmt_source("ContactName", source.get("contact_name"))
    out += _fmt_source("Phone", source.get("phone"))
    out += _fmt_source("Email", source.get("email"))
    if use_citation:
        out += _fmt_source("Citation", source.get("citation"))
    return out


def censor_codes_block() -> str:
    """generateCensorCodes (DatasetUtilities.py:515-520)."""
    return (
        "# Censor Codes\n"
        + "# ----------------------------------\n"
        + "# nc: not censored\n"
        + "#\n"
    )


def qualifier_codes_block(codes: list[tuple]) -> str:
    """generateQualifierCodes (DatasetUtilities.py:523-534): '' for no
    codes, else a block already ending in its own '#\\n'."""
    if not codes:
        return ""
    out = "# Qualifier Codes\n# ----------------------------------\n"
    for code in codes:
        _, abrv, definition = code
        out += "# %s: %s\n" % (abrv, definition)
    return out + "#\n"


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------


def build_series_file_header(
    site: dict,
    source: dict,
    variables: list[tuple[str, dict, dict]],
    qualifier_codes: list[tuple] | None = None,
    has_censor_codes: bool = False,
) -> str:
    """BuildSeriesFileHeader (DatasetUtilities.py:420-466).

    ``variables`` is [(column_name, var, method), ...]: one entry selects
    the expanded single-series block, several select the compact block.
    """
    qualifier_codes = qualifier_codes or []
    if len(variables) == 1:
        _, var, method = variables[0]
        var_block = expanded_variable_block(var, method)
    else:
        var_block = compact_variable_block(variables)
    header = site_information(site)
    header += var_block + "#\n"
    header += source_information(source) + "#\n"
    if has_censor_codes:
        header += censor_codes_block()
    header += qualifier_codes_block(qualifier_codes) + "#\n"
    return header
