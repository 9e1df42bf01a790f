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

    ``xpath`` with ``local-name()`` predicates, so a default KML
    namespace cannot break matching; the twelve per-field arrays are
    arrays_zip'd and exploded — pure JVM, no Python parsing.
    """
    doc = spark.createDataFrame([(kml_text,)], "xml string")
    arrays = [
        F.xpath(
            "xml",
            F.lit(
                f"//*[local-name()='Placemark']/*[local-name()='{tag}']/text()"
            ),
        ).alias(col)
        for col, tag in PLACEMARK_FIELDS.items()
    ]
    zipped = doc.select(F.arrays_zip(*arrays).alias("pm"))
    row = zipped.select(F.explode("pm").alias("r"))
    return row.select(
        *[F.trim(F.col(f"r.{c}")).alias(c) for c in PLACEMARK_FIELDS]
    )


def kmz_to_track(spark: SparkSession, kmz_path: str) -> DataFrame:
    """Full S2->S4 path: KMZ -> placemark rows with typed lat/lon
    (the reference's ``kmz2csv.py`` end-to-end, minus the CSV sink —
    compose with ``sources.tracks.write_track_csv`` for S5)."""
    rows = placemarks_to_rows(spark, extract_kml_text(kmz_path))
    return rows.withColumn("lat", F.col("lat").cast("double")).withColumn(
        "lon", F.col("lon").cast("double")
    )
