"""Extension-property derivation helpers — the Spark reading of the
reference's pydantic extension stack (prefix aliasing, field validators,
asset/service projections).

- prefix aliasing: property keys become ``<prefix>:<field>`` except names
  containing 'datetime' (/root/reference/STACpopulator/extensions/
  base.py:100-105, cmip6.py:70-72)
- validators (cmip6.py:112-131): ``only_item`` (1-element list → scalar),
  ``split`` (space-split string → array), ``validate_version``
  (``^v\\d+$`` check)
- ``cf:parameter`` projection: variables → [{name, unit}], unnamed
  skipped (extensions/cf.py:52-65)
- asset service-type filter (cmip6.py:287-307): keep assets whose key is
  in a service-type set
- media-type/roles lookup for assets (thredds.py:135-172, tables
  thredds.py:20-41)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# media-type / roles tables mirroring extensions/thredds.py:20-41
SERVICE_MEDIA_TYPES = {
    "httpserver": "application/x-netcdf",
    "opendap": "text/html",
    "ncml": "application/xml",
    "wcs": "application/xml",
    "wms": "application/xml",
    "netcdfsubset": "application/x-netcdf",
    "netcdfsubsetgrid": "application/x-netcdf",
    "netcdfsubsetpoint": "application/x-netcdf",
}
SERVICE_ROLES = {
    "httpserver": ["data"],
    "opendap": ["data"],
    "ncml": ["metadata"],
    "wcs": ["data"],
    "wms": ["visual"],
    "netcdfsubset": ["data"],
    "netcdfsubsetgrid": ["data"],
    "netcdfsubsetpoint": ["data"],
}

# canonical asset keys — the COMPLETE ServiceType enum
# (stac_utils.py:315-345, all members). The reference keys assets by
# ServiceType(<svc>).value, so 'OPENDAP' in access_urls becomes asset key
# 'OpenDAP'. 'Compound' is a member but is filtered out at catalog-crawl
# time (input.py:136 service[@serviceType!='Compound']) — kept here so
# from_value-style lookups resolve it, mirrored by skipping it in
# assets_from_access_urls.
SERVICE_CANONICAL = {
    "adde": "ADDE",
    "dap4": "DAP4",
    "dods": "DODS",  # same as OpenDAP
    "opendap": "OpenDAP",
    "opendapg": "OpenDAPG",
    "netcdfsubset": "NetcdfSubset",  # THREDDS < 5.0
    "netcdfsubsetgrid": "NetcdfSubsetGrid",  # THREDDS > 5.0
    "netcdfsubsetpoint": "NetcdfSubsetPoint",  # THREDDS > 5.0
    "cdmremote": "CdmRemote",
    "cdmfeature": "CdmFeature",
    "ncjson": "ncJSON",
    "h5service": "H5Service",
    "httpserver": "HTTPServer",
    "ftp": "FTP",
    "gridftp": "GridFTP",
    "file": "File",
    "iso": "ISO",
    "las": "LAS",
    "ncml": "NcML",
    "uddc": "UDDC",
    "wcs": "WCS",
    "wms": "WMS",
    "wsdl": "WSDL",
    "webform": "WebForm",
    "catalog": "Catalog",
    "compound": "Compound",
    "resolver": "Resolver",
    "thredds": "THREDDS",
}


def canonical_service_key(key: F.Column, href: F.Column | None = None) -> F.Column:
    """ServiceType.from_value as a column expression: case-insensitive
    lookup with '_service' suffix strip (stac_utils.py:347-358); unknown
    services pass through unchanged (the reference's explicit-default
    path). With ``href``, a bare 'NetcdfSubset' key is disambiguated to
    Grid/Point from the service base path, mirroring the crawl-time rule
    (input.py:127-133: 'point'/'grid' as a path component)."""
    norm = F.regexp_replace(F.lower(key), "_service$", "")
    expr = key  # unknown → pass through
    for svc, canon in SERVICE_CANONICAL.items():
        expr = F.when(norm == svc, F.lit(canon)).otherwise(expr)
    if href is not None:
        expr = (
            F.when(
                (norm == "netcdfsubset") & href.rlike("(^|/)point(/|$)"),
                F.lit("NetcdfSubsetPoint"),
            )
            .when(
                (norm == "netcdfsubset") & href.rlike("(^|/)grid(/|$)"),
                F.lit("NetcdfSubsetGrid"),
            )
            .otherwise(expr)
        )
    return expr


def canonicalize_access_urls(access_urls_col: F.Column) -> F.Column:
    """MAP<raw service, href> → MAP<canonical ServiceType value, href>,
    dropping Compound entries (input.py:136) and disambiguating
    NetcdfSubset grid/point from the href path — the Spark reading of
    THREDDSLoader._update_access_urls (S3, input.py:117-144).

    Two raw keys can canonicalize to the SAME ServiceType (e.g. 'OPENDAP'
    and 'opendap_service' → 'OpenDAP'); the reference's dict update is
    silently last-wins (input.py:140-142), so build the map from
    last-wins-deduplicated entries rather than transform_keys — the latter
    throws DUPLICATED_MAP_KEY under the default
    spark.sql.mapKeyDedupPolicy=EXCEPTION (a job crash, not a dead-letter).
    The dedup filter is O(n²) per row over a ≤28-entry service map — free."""
    entries = F.map_entries(access_urls_col)
    canon = F.transform(
        entries,
        lambda e: F.struct(
            canonical_service_key(e["key"], e["value"]).alias("key"),
            e["value"].alias("value"),
        ),
    )
    kept = F.filter(canon, lambda e: e["key"] != F.lit("Compound"))
    deduped = F.filter(
        kept,
        lambda e, i: F.size(
            F.filter(kept, lambda e2, j: (e2["key"] == e["key"]) & (j > i))
        )
        == 0,
    )
    return F.map_from_entries(deduped)


def prefix_properties(df: DataFrame, prefix: str, fields: list[str]) -> DataFrame:
    """Rename each field to ``<prefix>:<field>`` unless the name contains
    'datetime' (base.py:100-105)."""
    out = df
    for f in fields:
        if "datetime" not in f:
            out = out.withColumnRenamed(f, f"{prefix}:{f}")
    return out


def only_item(col: F.Column) -> F.Column:
    """1-element array → its scalar; longer arrays left intact is an error
    in the reference (cmip6.py:112-118) — here: take element 1 only when
    size==1, else null (invalid routed by validate stage)."""
    return F.when(F.size(col) == 1, F.element_at(col, 1))


def split_field(col: F.Column) -> F.Column:
    """Space-split string → array (cmip6.py:120-124, realm/source_type)."""
    return F.split(F.trim(col), r"\s+")


def valid_version(col: F.Column) -> F.Column:
    """``^v\\d+$`` validity predicate (cmip6.py:126-131)."""
    return col.rlike(r"^v[0-9]+$")


def cf_parameters(variables_col: F.Column) -> F.Column:
    """array<struct<standard_name,units,...>> → array<struct<name,unit>>,
    entries without a standard_name dropped (cf.py:52-65)."""
    named = F.filter(
        variables_col,
        lambda v: v["standard_name"].isNotNull() & (F.length(v["standard_name"]) > 0),
    )
    return F.transform(
        named,
        lambda v: F.struct(v["standard_name"].alias("name"), v["units"].alias("unit")),
    )


def filter_assets_by_service(assets_col: F.Column, service_types: list[str]) -> F.Column:
    """MAP<service, asset> → only entries whose key is in service_types,
    case-insensitive with '_service' suffix strip (ServiceType.from_value,
    stac_utils.py:347-358 + get_assets filter cmip6.py:287-307)."""
    def _norm(s: str) -> str:
        s = s.lower()
        return s[: -len("_service")] if s.endswith("_service") else s

    wanted = F.array(*[F.lit(_norm(s)) for s in service_types])
    norm = lambda k: F.regexp_replace(F.lower(k), "_service$", "")
    return F.map_filter(assets_col, lambda k, v: F.array_contains(wanted, norm(k)))


def assets_from_access_urls(access_urls_col: F.Column, canonical: bool = True) -> F.Column:
    """MAP<service, href> → MAP<service, struct<href, type, roles>> using
    the broadcast media/roles tables (thredds.py:135-172). Unknown services
    get null type and ['data'] (the reference's default role). By default
    keys are canonicalized first (ServiceType.from_value, the reference's
    THREDDSHelper.__init__ thredds.py:139) and Compound entries dropped."""
    if canonical:
        access_urls_col = canonicalize_access_urls(access_urls_col)

    def media(k):
        expr = F.lit(None).cast("string")
        for svc, mt in SERVICE_MEDIA_TYPES.items():
            expr = F.when(F.lower(k) == svc, F.lit(mt)).otherwise(expr)
        return expr

    def roles(k):
        expr = F.array(F.lit("data"))
        for svc, rl in SERVICE_ROLES.items():
            expr = F.when(F.lower(k) == svc, F.array(*[F.lit(r) for r in rl])).otherwise(expr)
        return expr

    return F.transform_values(
        access_urls_col,
        lambda k, v: F.struct(v.alias("href"), media(k).alias("type"), roles(k).alias("roles")),
    )


def wxs_get_capabilities(assets_col: F.Column) -> F.Column:
    """Append ?request=GetCapabilities to W[CM]S hrefs
    (THREDDSLoader._add_WxS_queries, input.py:146-150)."""
    return F.transform_values(
        assets_col,
        lambda k, v: F.when(
            F.upper(k).rlike("^W[CM]S"),
            F.concat(v, F.lit("?request=GetCapabilities")),
        ).otherwise(v),
    )


def magpie_source_link(url_col: F.Column) -> F.Column:
    """struct<rel,href,title> 'source' link; title = path after
    'fileServer/' (stac_utils.py:299-312)."""
    title = F.regexp_extract(url_col, r"fileServer/(.*)$", 1)
    return F.struct(
        F.lit("source").alias("rel"),
        url_col.alias("href"),
        F.when(F.length(title) > 0, title).alias("title"),
    )
