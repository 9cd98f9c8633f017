"""SeaBASS-style delimited-text ingest (SURVEY.md §2.1 op03, §3.2).

Re-expresses the reference reader's semantics
(`ocdb/core/seabass/sb_file_reader.py::SbFileReader` [U]):

- `/begin_header` … `/end_header` key=value block;
- `/delimiter=` chooses the field separator (comma | space | tab);
- `/fields=` names the columns (the file's dynamic schema);
- `/missing=` token (and below-detection-limit `/below_detection_limit=`)
  maps to NULL;
- records after the header parse to typed (double-where-possible) rows.

Spark-first shape: the bounded header (dozens of lines) is read
driver-side; the unbounded record body is parsed as a DataFrame —
`spark.read.text` → filter → `split()` → per-field `element_at` +
null-token mapping + cast, all JVM expressions. At 100 TB (many
files) the same parse runs per-file via a file-path column and
per-file headers resolved into a broadcast map; one file = this
function.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# F.split takes a Java regex. /delimiter=space means "whitespace runs"
# in SeaBASS (aligned tables pad with consecutive spaces — a literal
# ' ' split would emit empty tokens and shift every later field).
_DELIMS = {"comma": ",", "space": r"\s+", "tab": "\t"}

# Deterministic fixture used by op03 and the unit tests — shaped like a
# public SeaBASS example (header keys from the format spec; synthetic values).
FIXTURE = """/begin_header
/investigators=Jane_Doe
/affiliations=Example_Lab
/experiment=EXP2024
/cruise=CR001
/delimiter=comma
/missing=-999
/below_detection_limit=-888
/fields=depth,chl,wt,sal
/units=m,mg/m^3,degreesC,PSU
/end_header
1.0,0.52,12.3,35.1
2.5,-999,12.1,35.0
5.0,0.31,-999,34.9
7.5,0.22,11.8,-888
10.0,-888,11.5,34.7
"""


# Heterogeneous fixtures for the LONG-format open-schema demo (op204):
# same format, DIFFERENT /fields= sets and delimiters — the reference's
# per-file dynamic schema (SURVEY §1.3: every SeaBASS file declares its
# own columns; the store's common shape is the long record
# (dataset_id, field, value), not a union of wide schemas).
FIXTURE2 = """/begin_header
/investigators=A_B
/affiliations=Example_Lab
/experiment=EXP2024
/cruise=CR002
/delimiter=space
/missing=-999
/fields=depth,lu412,lu443,es412
/units=m,uW/cm^2/nm/sr,uW/cm^2/nm/sr,uW/cm^2/nm
/end_header
1.0   1.11  2.22  3.33
5.0  -999   2.10  3.20
10.0  0.95  1.98 -999
20.0  0.80 -999   3.05
"""

FIXTURE3 = """/begin_header
/investigators=C_D
/experiment=EXP2024
/cruise=CR003
/delimiter=tab
/missing=-999
/fields=depth,chl,kd490,sal
/units=m,mg/m^3,1/m,PSU
/end_header
2.0\t0.50\t0.061\t35.2
4.0\t-999\t0.055\t35.1
8.0\t0.42\t-999\t35.0
"""


def parse_header(lines: list[str]) -> dict[str, str]:
    """Parse `/key=value` header lines (between /begin_header and
    /end_header) into a dict. Mirrors the reference's header scan."""
    header: dict[str, str] = {}
    for ln in lines:
        ln = ln.strip()
        if not ln.startswith("/"):
            continue
        if ln in ("/begin_header", "/end_header"):
            continue
        if "=" in ln:
            k, v = ln[1:].split("=", 1)
            header[k.strip().lower()] = v.strip()
    return header


def _header_spec(
    head_lines: list[str], path: str
) -> tuple[str, list[str], list[str]]:
    """Resolve (delimiter regex, fields, null tokens) from a file's
    first lines, with the STRUCTURAL guard: the first body line must
    split into exactly len(fields) tokens. A misdeclared delimiter or
    a misaligned /fields= list is a file-level misconfiguration that
    must stay LOUD — with read_seabass's downstream try_cast it would
    otherwise parse as an all-NULL frame (and ZERO records through
    the long path's isNotNull filter): silent total data loss, the
    failure mode the session code review flagged. Per-CELL junk is a
    different class and maps to NULL. Bodies starting past the
    collected window are rare (200-line headers); the check is then
    skipped, not faked."""
    import re as _re

    try:
        end = next(
            i for i, ln in enumerate(head_lines) if ln.strip() == "/end_header"
        )
    except StopIteration:
        raise ValueError(f"{path}: no /end_header in first 200 lines")
    header = parse_header(head_lines[: end + 1])

    delim_tok = header.get("delimiter", "comma").strip().lower()
    if delim_tok not in _DELIMS:
        # silent comma fallback misattributed the real misconfiguration:
        # multi-field files then died blaming 'misaligned fields', and
        # single-field files parsed under the WRONG delimiter with no
        # diagnostic (round-13 review)
        raise ValueError(
            f"{path}: unsupported /delimiter= value {delim_tok!r} "
            f"(known: {sorted(_DELIMS)})"
        )
    delim = _DELIMS[delim_tok]
    fields = [f.strip() for f in header.get("fields", "").split(",") if f.strip()]
    if not fields:
        raise ValueError(f"{path}: missing /fields= header")
    if len(set(fields)) != len(fields):
        # A repeated /fields= name is the same structural class as a
        # misaligned list: downstream by-name selection would throw
        # Spark's AMBIGUOUS_REFERENCE deep inside the ingest job.
        # Fail catalog-time with the file and the offender named.
        dups = sorted({f for f in fields if fields.count(f) > 1})
        raise ValueError(
            f"{path}: /fields= repeats column name(s) {dups} — "
            "field names must be unique"
        )
    null_tokens = [
        t
        for t in (header.get("missing"), header.get("below_detection_limit"))
        if t
    ]

    first_body = next(
        (
            ln.strip()
            for ln in head_lines[end + 1:]
            if ln.strip() and not ln.strip().startswith(("/", "!"))
        ),
        None,
    )
    if first_body is not None:
        n_tok = len(
            _re.split(delim, first_body)
            if delim == _DELIMS["space"]
            else first_body.split(delim)
        )
        if n_tok != len(fields):
            raise ValueError(
                f"{path}: first record splits into {n_tok} tokens under "
                f"delimiter={header.get('delimiter', 'comma')!r} but "
                f"/fields= declares {len(fields)} columns — misdeclared "
                "delimiter or misaligned fields list"
            )
    return delim, fields, null_tokens


def _parse_body(
    raw: DataFrame,
    delim: str,
    fields: list[str],
    null_tokens: list[str],
) -> tuple[DataFrame, list]:
    """The ONE body-parse block both the per-file and corpus readers
    share (extracted after a review caught the two copies drifting):
    trimmed-line comment/blank filter — an INDENTED '/'-line or '!'
    comment would otherwise slip past an unstripped startswith and
    ingest as a phantom all-NULL record — then split, positional
    element_at, and null-token mapping, all STRING-typed. Returns
    (filtered body frame, per-field column expressions) so callers
    compose the final select: read_seabass_raw selects them as-is,
    read_seabass_corpus prepends its input_file_name-derived
    dataset_id and layers try_cast on each; any future body-grammar
    fix lands here exactly once."""
    trimmed = F.trim(F.col("value"))
    body = raw.filter(
        ~trimmed.startswith("/") & ~trimmed.startswith("!") & (trimmed != "")
    )
    # trim before splitting so a leading-aligned field doesn't produce
    # an empty first token under the \s+ delimiter
    parts = F.split(F.trim(F.col("value")), delim)
    cols = []
    for i, name in enumerate(fields):
        # try_element_at: under Spark 4's default ANSI mode a plain
        # element_at THROWS on a ragged (short) row, killing the whole
        # corpus-scale scan — the module's own taxonomy says one bad
        # cell maps to NULL (round-13 review; same contract as the
        # try_cast below)
        c = F.trim(F.try_element_at(parts, F.lit(i + 1)))
        for tok in null_tokens:
            c = F.nullif(c, F.lit(tok))
        cols.append(c.alias(name))
    return body, cols


def read_seabass_raw(spark: SparkSession, path: str) -> DataFrame:
    """Read one SeaBASS-style file into STRING columns: header-driven
    split + null-token mapping, NO numeric cast. This is the
    reference's actual record model — `List[List[Union[float, str]]]`
    (`Dataset.records` [U]) — where date/time/station fields stay
    text; `read_seabass` layers the all-double cast on top for the
    numeric analytics path, and `seabass_record_geotime` composes the
    per-record geo/time columns from these raw strings."""
    raw = spark.read.text(path)
    # header: everything until /end_header — bounded, take() is safe.
    head_lines = [r.value for r in raw.limit(200).collect()]
    delim, fields, null_tokens = _header_spec(head_lines, path)
    body, cols = _parse_body(raw, delim, fields, null_tokens)
    return body.select(*cols)


def read_seabass(spark: SparkSession, path: str) -> DataFrame:
    """Read one SeaBASS-style file into a typed all-double DataFrame.

    Header is bounded → driver-side parse of the first lines; the
    record body is a distributed text scan parsed with JVM expressions
    (split + element_at + null-token mapping + cast to double).

    try_cast, not cast: under ANSI mode a plain cast THROWS on any
    malformed token (found by the randomized file fuzz — real SeaBASS
    bodies carry non-numeric cells beyond the declared /missing= and
    /below_detection_limit= markers: time strings, station names,
    stray comments). One bad cell must map to NULL, not kill a
    corpus-scale ingest job; the validation rule engine is where bad
    cells get FLAGGED (required/value_range over the parsed wide
    frame). File-level structural breakage raises loudly in
    read_seabass_raw instead; text-typed fields are served by
    read_seabass_raw + seabass_record_geotime."""
    raw = read_seabass_raw(spark, path)
    return raw.select(
        *[F.col(c).try_cast("double").alias(c) for c in raw.columns]
    )


def seabass_record_geotime(
    raw: DataFrame,
    date_col: str = "date",
    time_col: str = "time",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Append the reference's per-record geolocation/time columns —
    `Dataset.longitudes/latitudes/times` [U] — to a read_seabass_raw
    frame: `longitude`/`latitude` as doubles and `ts` as a TIMESTAMP
    composed from the standard SeaBASS `date` (YYYYMMDD) + `time`
    (HH:MM:SS) fields. These are exactly the columns the search
    façade binds (SearchColumns x/y/t_start), closing the loop from
    file ingest to bbox/time-interval search.

    All-JVM expressions; malformed date/time compose to NULL ts via
    try_to_timestamp (same taxonomy as the reader: cell-level junk →
    NULL + validation, not a killed job)."""
    for c in (date_col, time_col, lat_col, lon_col):
        if c not in raw.columns:
            raise ValueError(
                f"seabass_record_geotime: field {c!r} not in frame "
                f"(have {raw.columns})"
            )
    ts = F.expr(
        f"try_to_timestamp(concat(`{date_col}`, ' ', `{time_col}`),"
        " 'yyyyMMdd HH:mm:ss')"
    )
    return (
        raw.withColumn("longitude", F.col(lon_col).try_cast("double"))
        .withColumn("latitude", F.col(lat_col).try_cast("double"))
        .withColumn("ts", ts)
    )


def read_seabass_long(spark: SparkSession, path: str, dataset_id: str) -> DataFrame:
    """Read one SeaBASS-style file into the LONG open-schema record
    shape `(dataset_id, field, value)` — the Spark mapping of the
    reference's `/fields=`-driven dynamic per-file schema (SURVEY
    §1.3/§7.2): heterogeneous files that could never union as wide
    frames union trivially as long records, and field-level queries
    (product groups, wavelength ranges) become plain predicates.

    The unpivot is a JVM-side `stack()` over the wide parse (one
    generator expression, no shuffle); missing-token observations
    (NULL after the wide parse) are dropped — a missing value is an
    absent record, not a stored NULL, matching the reference's sparse
    per-file storage."""
    wide = read_seabass(spark, path)
    n = len(wide.columns)
    pairs = ", ".join(f"'{c}', `{c}`" for c in wide.columns)
    return (
        wide.select(
            F.lit(dataset_id).alias("dataset_id"),
            F.expr(f"stack({n}, {pairs})").alias("field", "value"),
        )
        .filter(F.col("value").isNotNull())
    )


def read_seabass_corpus(spark: SparkSession, paths: list[str]) -> DataFrame:
    """LONG records `(dataset_id, field, value)` for a CORPUS of
    SeaBASS files — the module docstring's many-files scale path,
    built: files are grouped by header SIGNATURE (delimiter, fields
    tuple, null tokens) and each signature group parses in ONE
    distributed text scan over ALL its files, with `input_file_name()`
    supplying the dataset_id (file stem). The number of Spark scans
    equals the number of DISTINCT header shapes in the corpus, not
    the number of files — a 100k-file drop with a dozen field layouts
    is a dozen scans, each fanning out one task per file (text files
    split per-file like op207's gzip story).

    Header resolution is the one-time catalog step: each file's
    bounded header (≤200 lines) is read driver-side and folded into
    the file→signature map — KBs of metadata even at 100k files, the
    'per-file headers resolved into a broadcast map' the module
    docstring promises (here the map folds into plan literals rather
    than a runtime broadcast: each signature group's parse is
    identical for every file in it). Structural misalignment in any
    file raises loudly at catalog time with the file named
    (_header_spec's guard), before any cluster work.

    Output matches `read_seabass_long` exactly (same stack shape,
    NULL observations dropped, value cast to double via try_cast) —
    asserted in tests against a per-file union."""
    import re as _re

    by_sig: dict[tuple, list[str]] = {}
    stems: dict[str, str] = {}
    for p in paths:
        # dataset_id = file stem, so stems must be UNIQUE across the
        # whole corpus: two files named site1.sb in different drop
        # directories would otherwise silently pool into one dataset
        # (review finding). Loud catalog-time guard, both paths named.
        stem = _re.sub(r"\.[^.]*$", "", os.path.basename(p))
        if stem in stems:
            if stems[stem] == p:
                # the SAME path twice (glob + explicit overlap) would
                # pass the stem guard and spark.read.text([p, p]) then
                # reads the file twice — every record silently doubled
                # (round-13 review); skip the duplicate entry
                continue
            raise ValueError(
                f"read_seabass_corpus: duplicate dataset stem {stem!r} "
                f"from {stems[stem]!r} and {p!r} — files must have "
                "unique basenames (the stem becomes dataset_id)"
            )
        stems[stem] = p
        with open(p, encoding="utf-8", errors="replace") as f:
            head_lines = [next(f, "") for _ in range(200)]
        delim, fields, null_tokens = _header_spec(head_lines, p)
        by_sig.setdefault(
            (delim, tuple(fields), tuple(null_tokens)), []
        ).append(p)

    frames = []
    for (delim, fields, null_tokens), group in sorted(by_sig.items()):
        raw = spark.read.text(group)
        body, cols = _parse_body(raw, delim, list(fields), list(null_tokens))
        cols = [c.try_cast("double").alias(n) for c, n in zip(cols, fields)]
        # input_file_name() returns the file URI percent-ENCODED
        # ('my station.sb' → 'my%20station.sb'), so decode the
        # basename before stripping the extension; the '+'→'%2B'
        # pre-substitution keeps url_decode (form-decoding: '+' is a
        # space) from eating literal '+' in filenames.
        fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
        ds_id = F.regexp_replace(
            F.url_decode(F.replace(fname, F.lit("+"), F.lit("%2B"))),
            r"\.[^.]*$",
            "",
        )
        wide = body.select(ds_id.alias("dataset_id"), *cols)
        pairs = ", ".join(f"'{c}', `{c}`" for c in fields)
        frames.append(
            wide.select(
                "dataset_id",
                F.expr(f"stack({len(fields)}, {pairs})").alias(
                    "field", "value"
                ),
            ).filter(F.col("value").isNotNull())
        )
    if not frames:
        raise ValueError("read_seabass_corpus: empty path list")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
