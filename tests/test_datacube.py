"""cube: dimension/variable classification vs the reference's expectations
(/root/reference/tests/test_cmip6_datacube.py:60-125 shape: time/lat/lon
spatial-temporal dims, bounds vars auxiliary with inherited units, data
vars classified data)."""

from pyspark.sql import functions as F

from stac_populator_spark.operators.datacube import with_datacube

VARS_SCHEMA = (
    "vars array<struct<name string, standard_name string, units string, "
    "axis string, bounds string>>"
)

CMIP6ISH = [
    (
        [
            ("time", "time", "days since 1850-01-01", "T", "time_bnds"),
            ("lat", "latitude", "degrees_north", "Y", "lat_bnds"),
            ("lon", "longitude", "degrees_east", "X", "lon_bnds"),
            ("plev", "air_pressure", "Pa", "Z", None),
            ("time_bnds", None, None, None, None),
            ("lat_bnds", None, None, None, None),
            ("lon_bnds", None, None, None, None),
            ("tas", "air_temperature", "K", None, None),
        ],
    )
]


def _df(spark):
    return spark.createDataFrame(CMIP6ISH, VARS_SCHEMA)


def test_dimensions(spark):
    row = with_datacube(_df(spark)).select("cube_dimensions").collect()[0]
    dims = {d["name"]: d for d in row["cube_dimensions"]}
    assert set(dims) == {"time", "lat", "lon", "plev"}
    assert dims["time"]["type"] == "temporal" and dims["time"]["axis"] == "t"
    assert dims["lat"]["type"] == "spatial" and dims["lat"]["axis"] == "y"
    assert dims["lon"]["type"] == "spatial" and dims["lon"]["axis"] == "x"
    assert dims["plev"]["type"] == "spatial" and dims["plev"]["axis"] == "z"
    assert dims["lat"]["unit"] == "degrees_north"


def test_variables_split_and_bounds_inheritance(spark):
    row = with_datacube(_df(spark)).select("cube_variables").collect()[0]
    vars_ = {v["name"]: v for v in row["cube_variables"]}
    # data vs auxiliary (datacube.py:208-250)
    assert vars_["tas"]["var_type"] == "data"
    for aux in ("time", "lat", "lon", "plev", "time_bnds", "lat_bnds", "lon_bnds"):
        assert vars_[aux]["var_type"] == "auxiliary", aux
    # bounds vars inherit the owning coordinate's units (datacube.py:222-232)
    assert vars_["lat_bnds"]["unit"] == "degrees_north"
    assert vars_["time_bnds"]["unit"] == "days since 1850-01-01"
    assert vars_["tas"]["unit"] == "K"
