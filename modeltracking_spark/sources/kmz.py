"""KMZ -> KML -> rows ingest (SURVEY.md §2.1 S2-S4).

The reference shells out to unzip + BeautifulSoup row loops
(``kmz2csv.py:14-35``); here the zip open is a tiny driver-side step
(KMZ files are KB-sized control inputs, not data) and the placemark
parse is Spark ``xpath`` over an XML column — so a directory of
thousands of KMZ files parallelizes by making each file one row of a
binaryFile scan and running the same xpath expressions per row.
"""

from __future__ import annotations

import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: output column -> KML child tag of <Placemark> (kmz2csv.py:20-21; tags
#: are case-sensitive in XML, unlike the reference's lowercasing soup)
PLACEMARK_FIELDS: dict[str, str] = {
    "atcfdtg": "atcfdtg",
    "stormnum": "stormNum",
    "stormname": "stormName",
    "basin": "basin",
    "stormtype": "stormType",
    "intensity": "intensity",
    "intensitymph": "intensityMPH",
    "intensitykph": "intensityKPH",
    "lat": "lat",
    "lon": "lon",
    "minsealevelpres": "minSeaLevelPres",
    "dtg": "dtg",
}


def extract_kml_text(kmz_path: str) -> str:
    """S2: read the inner ``.kml`` document out of a KMZ zip."""
    with zipfile.ZipFile(kmz_path, "r") as z:
        kml_names = [n for n in z.namelist() if n.lower().endswith(".kml")]
        if not kml_names:
            raise ValueError(f"no .kml entry in {kmz_path}")
        return z.read(kml_names[0]).decode("utf-8", errors="replace")


def placemarks_to_rows(spark: SparkSession, kml_text: str) -> DataFrame:
    """S3/S4: one row per ``<Placemark>`` with the 12 reference fields.

    The document is first split into one fragment PER placemark (regex
    explode), then each field is xpath'd out of its own fragment — so a
    placemark missing an optional tag yields NULL for that row only.
    (Zipping 12 independently-collected document-level xpath arrays
    would silently misalign every row after the first missing tag.)
    ``local-name()`` predicates keep a default KML namespace from
    breaking matching; everything is JVM expressions.
    """
    doc = spark.createDataFrame([(kml_text,)], "xml string")
    frags = doc.select(
        F.explode(
            F.regexp_extract_all(
                "xml", F.lit(r"(?s)<Placemark.*?</Placemark>"), 0
            )
        ).alias("pm")
    )
    return frags.select(
        *[
            F.nullif(
                F.trim(
                    F.xpath_string(
                        "pm", F.lit(f"//*[local-name()='{tag}']")
                    )
                ),
                F.lit(""),
            ).alias(col)
            for col, tag in PLACEMARK_FIELDS.items()
        ]
    )


def kmz_to_track(spark: SparkSession, kmz_path: str) -> DataFrame:
    """Full S2->S4 path: KMZ -> placemark rows with typed lat/lon
    (the reference's ``kmz2csv.py`` end-to-end, minus the CSV sink —
    compose with ``sources.tracks.write_track_csv`` for S5)."""
    rows = placemarks_to_rows(spark, extract_kml_text(kmz_path))
    return rows.withColumn("lat", F.col("lat").cast("double")).withColumn(
        "lon", F.col("lon").cast("double")
    )
