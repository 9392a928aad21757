"""URL host / registered-domain column functions (functions/urls.py)."""

import pandas as pd
from pyspark.sql import functions as F

from stac_populator_spark.functions.urls import url_host, url_registered_domain


def test_host_and_registered_domain(spark):
    cases = {
        "https://news.BBC.co.uk/path?q=1": ("news.bbc.co.uk", "bbc.co.uk"),
        "http://user:pw@a.b.Example.com:8080/x": ("a.b.example.com", "example.com"),
        "https://shop.acme.com.au/": ("shop.acme.com.au", "acme.com.au"),
        "ftp://files.mysite.org": ("files.mysite.org", "mysite.org"),
        "https://localhost/x": ("localhost", ""),  # single label: no registrable domain
    }
    df = spark.createDataFrame(pd.DataFrame({"url": list(cases)}))
    got = {
        r["url"]: (r["h"], r["d"])
        for r in df.select(
            "url",
            url_host(F.col("url")).alias("h"),
            url_registered_domain(F.col("url")).alias("d"),
        ).collect()
    }
    assert got == cases
