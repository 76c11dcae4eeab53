"""Resources, sources, transformers — the extract surface.

Re-expression of ``@dlt.resource`` / ``@dlt.source`` / ``@dlt.transformer``
(``dlt/extract/decorators.py:333-846``) and the pipe steps
(``dlt/extract/items_transform.py``, ``resource.py:312-447``).

A resource is a named producer of data for one (or dynamically many)
tables.  Accepted payloads: Spark DataFrame, pandas DataFrame, pyarrow
Table/RecordBatch, iterable/generator of dicts, or a callable returning
any of those.  Whatever the input, it is materialized **once** into a
Spark DataFrame (the engine's only data plane) and the declared pipe
steps are compiled onto it:

- ``add_map`` -> driver-side per-item fn for dict payloads, or a
  DataFrame->DataFrame fn for columnar payloads;
- ``add_filter`` -> ``df.filter`` (a Column/SQL-string predicate keeps the
  filter JVM-side and pushdown-eligible; a Python callable falls back to
  a row UDF and is the slow path, documented as such);
- ``add_yield_map`` -> explode-style flatMap (driver-side for dict items);
- ``add_limit`` -> ``df.limit``;
- ``select_tables`` -> keeps only items routed to the given tables
  (dynamic ``table_name=callable`` dispatch marks each item).
"""

from __future__ import annotations

import functools
import inspect
import json
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession

from ..incremental import Incremental


class WithTableName:
    """Per-item routing marker (reference ``dlt/extract/resource.py:93``)."""

    __slots__ = ("item", "table_name")

    def __init__(self, item: Any, table_name: str) -> None:
        self.item = item
        self.table_name = table_name


def with_table_name(item: Any, table_name: str) -> WithTableName:
    return WithTableName(item, table_name)


class WithHints:
    """Item wrapper carrying per-table load hints (reference
    ``dlt.mark.with_hints`` + ``make_hints``, ``extract/hints.py:127``):
    the item routes to ``hints["table_name"]`` (or the resource static
    name) and the hints override the resource-level
    write_disposition / primary_key / merge_key / merge_strategy for
    THAT table at load time."""

    __slots__ = ("item", "hints")

    def __init__(self, item: Any, hints: dict) -> None:
        self.item = item
        self.hints = hints


def make_hints(
    table_name: "Optional[str]" = None,
    write_disposition: "Optional[str]" = None,
    primary_key: "Optional[Sequence[str]]" = None,
    merge_key: "Optional[Sequence[str]]" = None,
    merge_strategy: "Optional[str]" = None,
    columns: "Optional[dict]" = None,
    references: "Optional[list]" = None,
) -> dict:
    """Build a hints dict for :func:`with_hints` — same surface as the
    reference ``dlt.mark.make_hints``; only non-None entries are kept."""
    out = {
        "table_name": table_name,
        "write_disposition": write_disposition,
        "primary_key": [primary_key] if isinstance(primary_key, str) else primary_key,
        "merge_key": [merge_key] if isinstance(merge_key, str) else merge_key,
        "merge_strategy": merge_strategy,
        "columns": columns,
        "references": references,
    }
    return {k: v for k, v in out.items() if v is not None}


def with_hints(item: Any, hints: dict) -> WithHints:
    return WithHints(item, hints)


class mark:  # noqa: N801 - mirrors `dlt.mark`
    with_table_name = staticmethod(with_table_name)
    with_hints = staticmethod(with_hints)
    make_hints = staticmethod(make_hints)


class _Deferred:
    __slots__ = ("fn", "args", "kwargs")

    def __init__(self, fn, args, kwargs) -> None:
        self.fn, self.args, self.kwargs = fn, args, kwargs


def defer(fn):
    """``@dlt.defer`` analog (reference ``dlt/__init__.py`` defer):
    calls return a deferred marker; the extraction loop resolves a
    window of pending markers CONCURRENTLY in a thread pool (I/O-bound
    per-item fetches overlap instead of serializing).  Spark-side work
    needs no defer — tasks are already parallel; this covers the
    driver-side generator phase the reference parallelizes with its
    futures pool."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return _Deferred(fn, args, kwargs)

    return wrapper


def _resolve_deferred(items: "Iterable[Any]", max_workers: int = 8) -> "Iterable[Any]":
    """Stream items, resolving runs of ``_Deferred`` markers in a shared
    thread pool (window = ``max_workers``, order preserved)."""
    from concurrent.futures import ThreadPoolExecutor

    pending: List = []
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        for it in items:
            if isinstance(it, _Deferred):
                pending.append(pool.submit(it.fn, *it.args, **it.kwargs))
                if len(pending) >= max_workers:
                    for f in pending:
                        yield f.result()
                    pending = []
            else:
                for f in pending:
                    yield f.result()
                pending = []
                yield it
        for f in pending:
            yield f.result()


class DltResource:
    def __init__(
        self,
        data: Any,
        name: str,
        table_name: Optional[Union[str, Callable[[Any], str]]] = None,
        write_disposition: str = "append",
        primary_key: Optional[Sequence[str]] = None,
        merge_key: Optional[Sequence[str]] = None,
        columns: Optional[dict] = None,
        incremental: Optional[Incremental] = None,
        merge_strategy: Optional[str] = None,
        max_table_nesting: Optional[int] = None,
        parallelized: bool = False,
        selected: bool = True,
        nested_hints: Optional[dict] = None,
        references: Optional[list] = None,
    ) -> None:
        self._data = data
        self.name = name
        self.table_name = table_name or name
        self.write_disposition = write_disposition
        self.primary_key = [primary_key] if isinstance(primary_key, str) else primary_key
        self.merge_key = [merge_key] if isinstance(merge_key, str) else merge_key
        self.columns = columns or {}
        self._pydantic_model = None
        self.incremental = incremental
        self.merge_strategy = merge_strategy
        self.max_table_nesting = max_table_nesting
        self.parallelized = parallelized
        self.selected = selected
        # per-child-table hints keyed by nested path ("items" or
        # "items__sub") or full child table name (reference
        # ``make_hints(nested_hints=...)``, hints.py:127): supported
        # keys per child: columns, primary_key, merge_key
        self.nested_hints = nested_hints or {}
        # declared table references (FK metadata the read path's join
        # derivation and the dq `references` check consume) — reference
        # ``make_hints(references=...)``, schema/typing.py:335
        self.references = references or []
        self._item_steps: List = []  # driver-side per-item steps
        self._df_steps: List[Callable[[DataFrame], DataFrame]] = []
        self._limit: Optional[int] = None
        self._max_time: Optional[float] = None
        self._selected_tables: Optional[List[str]] = None
        # per-table hint overrides collected from WithHints items
        self.table_hint_overrides: Dict[str, dict] = {}
        if self.columns:
            self._adopt_columns_model()

    def _adopt_columns_model(self) -> None:
        """``columns=PydanticModel`` (reference ``validation.py:34`` +
        ``libs/pydantic.py``): derive the column dict from the model and
        append a validation df step whose modes come from the model's
        ``extra`` config."""
        cols = self.columns
        if isinstance(cols, type):
            from ..schema.pydantic import (
                PYDANTIC_AVAILABLE,
                model_validation_step,
                pydantic_to_columns,
            )

            if not PYDANTIC_AVAILABLE:
                raise ImportError(
                    "columns=<class> requires pydantic; pass a dict column"
                    " spec instead"
                )
            self._pydantic_model = cols
            self.columns = pydantic_to_columns(cols)
            self._df_steps.append(model_validation_step(cols))

    def apply_hints(
        self,
        table_name: Optional[Union[str, Callable[[Any], str]]] = None,
        write_disposition: Optional[str] = None,
        primary_key: Optional[Sequence[str]] = None,
        merge_key: Optional[Sequence[str]] = None,
        columns: Optional[dict] = None,
        incremental: Optional[Incremental] = None,
        merge_strategy: Optional[str] = None,
        max_table_nesting: Optional[int] = None,
        nested_hints: Optional[dict] = None,
        references: Optional[list] = None,
    ) -> "DltResource":
        """Set or modify load hints after creation (reference
        ``extract/hints.py:395 apply_hints``): ``None`` leaves the
        existing hint, an empty value of the hint's type ("" / [] / {})
        removes it.  Returns self for chaining."""
        if table_name is not None:
            self.table_name = table_name or self.name
        if write_disposition is not None:
            self.write_disposition = write_disposition or "append"
        if primary_key is not None:
            pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
            self.primary_key = pk or None
        if merge_key is not None:
            mk = [merge_key] if isinstance(merge_key, str) else list(merge_key)
            self.merge_key = mk or None
        if columns is not None:
            self.columns = columns
            self._adopt_columns_model()
        if incremental is not None:
            self.incremental = incremental or None
        if merge_strategy is not None:
            self.merge_strategy = merge_strategy or None
        if max_table_nesting is not None:
            self.max_table_nesting = max_table_nesting
        if nested_hints is not None:
            self.nested_hints = nested_hints or {}
        if references is not None:
            self.references = references or []
        return self

    # -- pipe steps (reference resource.py:327-447) --

    def add_map(self, f: Callable[[Any], Any]) -> "DltResource":
        self._item_steps.append(("map", f))
        return self

    def add_filter(self, f: Union[Callable[[Any], bool], str, Column]) -> "DltResource":
        if isinstance(f, (str, Column)):
            self._df_steps.append(lambda df: df.filter(f))
        else:
            self._item_steps.append(("filter", f))
        return self

    def add_yield_map(self, f: Callable[[Any], Iterable[Any]]) -> "DltResource":
        self._item_steps.append(("yield_map", f))
        return self

    def add_limit(
        self, max_items: Optional[int] = None, max_time: Optional[float] = None
    ) -> "DltResource":
        """Row-count and/or wall-clock cap (reference LimitItem,
        ``items_transform.py:174-240``).  ``max_time`` applies to the
        driver-side iteration of dict/generator payloads (there is no
        Spark analog for a time-bounded scan — reference behavior)."""
        if max_items is not None:
            self._limit = max_items
        self._max_time = max_time
        return self

    def add_df_step(self, f: Callable[[DataFrame], DataFrame]) -> "DltResource":
        """Columnar transform applied after DataFrame materialization —
        the fast path for map/filter on large data."""
        self._df_steps.append(f)
        return self

    def add_metrics(self, name: str, *exprs: Column) -> "DltResource":
        """Side-channel metrics via ``df.observe`` (reference MetricsItem,
        ``items_transform.py:242``): collected by Spark's observation
        listener without an extra pass over the data."""
        self._df_steps.append(lambda df: df.observe(name, *exprs))
        return self

    def add_validation(
        self,
        required: Optional[Dict[str, str]] = None,
        mode: str = "freeze",
        model: Optional[type] = None,
        column_mode: Optional[str] = None,
    ) -> "DltResource":
        """Schema validation step (reference ValidateItem /
        pydantic integration, ``items_transform.py:148``,
        ``validation.py:34``):
        ``required`` maps column -> Spark type name.  ``freeze`` raises on
        violation (FAILFAST), ``discard_row`` filters rows whose required
        values are NULL after try_cast (DROPMALFORMED).  Alternatively pass
        ``model=`` (a pydantic model class) for full per-item validation
        with contract interplay (column_mode from the model's ``extra``
        config unless given)."""
        if model is not None:
            from ..schema.pydantic import model_validation_step

            data_mode = "discard_row" if mode == "discard_row" else mode
            self._df_steps.append(
                model_validation_step(model, column_mode=column_mode, data_mode=data_mode)
            )
            return self
        req = dict(required or {})

        def validate(df: DataFrame) -> DataFrame:
            from pyspark.sql import functions as SF

            missing = [c for c in req if c not in df.columns]
            if missing and mode == "freeze":
                raise ValueError(f"validation failed: missing columns {missing}")
            out = df
            for c, t in req.items():
                if c not in out.columns:
                    continue
                casted = SF.col(c).try_cast(t)
                if mode == "freeze":
                    out = out.withColumn(c, SF.col(c).cast(t))
                else:  # discard_row
                    out = out.withColumn(c, casted).filter(casted.isNotNull())
            return out

        self._df_steps.append(validate)
        return self

    def select_tables(self, *tables: str) -> "DltResource":
        self._selected_tables = list(tables)
        return self

    def parallelize(self) -> "DltResource":
        # Spark's task parallelism covers this (reference resource.py:447);
        # kept for API parity.
        self.parallelized = True
        return self

    def __or__(self, transformer: "DltTransformer") -> "DltResource":
        """`resource | transformer` composition (reference resource.py:619)."""
        return transformer.bind(self)

    # -- materialization --

    def _iter_items(self) -> Iterable[Any]:
        data = self._data
        if callable(data) and not isinstance(data, DataFrame):
            data = data()
        if inspect.isgenerator(data) or isinstance(data, (list, tuple)) or (
            isinstance(data, Iterable) and not isinstance(data, (DataFrame, str, bytes, dict))
        ):
            yield from _resolve_deferred(data)
        else:
            yield data

    def materialize(self, spark: SparkSession) -> Dict[str, DataFrame]:
        """Evaluate the resource into ``{table_name: DataFrame}``.

        Columnar payloads (DataFrame / pandas / arrow) pass straight
        through — the Arrow fast path (reference ``extractors.py:356``).
        Dict items run the driver-side pipe then ship to the JVM as one
        JSON-lines dataset so Spark infers the nested schema (no
        row-by-row Python typing on the hot path)."""
        data = self._data
        if callable(data) and not isinstance(data, DataFrame):
            data = data()

        # per-extraction: stale per-table hints from a previous run must
        # not leak into a run whose items carry different (or no) hints
        self.table_hint_overrides = {}

        if isinstance(data, DataFrame):
            return {self._static_table_name(): self._apply_df_steps(data)}
        try:
            import pandas as pd

            if isinstance(data, pd.DataFrame):
                return {
                    self._static_table_name(): self._apply_df_steps(
                        spark.createDataFrame(data)
                    )
                }
        except ImportError:  # pragma: no cover
            pass
        try:
            import pyarrow as pa

            if isinstance(data, (pa.Table, pa.RecordBatch)):
                tbl = data if isinstance(data, pa.Table) else pa.Table.from_batches([data])
                return {
                    self._static_table_name(): self._apply_df_steps(
                        spark.createDataFrame(tbl.to_pandas())
                    )
                }
        except ImportError:  # pragma: no cover
            pass

        # dict-items path
        import time as _time

        deadline = (_time.monotonic() + self._max_time) if self._max_time else None
        routed: Dict[str, List[Any]] = {}
        count = 0
        for item in self._iter_items():
            if deadline is not None and _time.monotonic() > deadline:
                break
            if isinstance(item, DataFrame):
                # generator of DataFrames: union afterwards
                routed.setdefault(self._static_table_name(), []).append(item)
                continue
            for out in self._apply_item_steps(item):
                tname = self._route(out)
                if isinstance(out, WithHints):
                    payload = out.item
                    self.table_hint_overrides.setdefault(tname, {}).update(out.hints)
                else:
                    payload = out.item if isinstance(out, WithTableName) else out
                if self._selected_tables and tname not in self._selected_tables:
                    continue
                routed.setdefault(tname, []).append(payload)
                count += 1
            if self._limit is not None and count >= self._limit:
                break

        result: Dict[str, DataFrame] = {}
        for tname, items in routed.items():
            if items and isinstance(items[0], DataFrame):
                df = items[0]
                for d in items[1:]:
                    df = df.unionByName(d, allowMissingColumns=True)
            else:
                if self._limit is not None:
                    items = items[: self._limit]
                df = _dicts_to_df(spark, items)
            result[tname] = self._apply_df_steps(df)
        return result

    def _static_table_name(self) -> str:
        return self.table_name if isinstance(self.table_name, str) else self.name

    def _route(self, item: Any) -> str:
        if isinstance(item, WithTableName):
            return item.table_name
        if isinstance(item, WithHints):
            return item.hints.get("table_name") or self._static_table_name()
        if callable(self.table_name):
            return self.table_name(item)
        return self.table_name

    def _apply_item_steps(self, item: Any) -> Iterable[Any]:
        outs = [item]
        for kind, f in self._item_steps:
            next_outs: List[Any] = []
            for it in outs:
                if kind == "map":
                    next_outs.append(f(it))
                elif kind == "filter":
                    if f(it):
                        next_outs.append(it)
                elif kind == "yield_map":
                    next_outs.extend(f(it))
            outs = next_outs
        return outs

    def _apply_df_steps(self, df: DataFrame) -> DataFrame:
        for f in self._df_steps:
            df = f(df)
        if self._limit is not None:
            df = df.limit(self._limit)
        return df


def _dicts_to_df(spark: SparkSession, items: List[Any]) -> DataFrame:
    """Dicts -> nested DataFrame via JVM-side JSON inference: one
    driver->JVM transfer, schema inferred by Spark's JSON reader (handles
    nesting, nulls, mixed numerics), no Python-per-row typing.

    r11 (guide §7.3/§4): the schema is inferred by the SAME
    ``schema_of_json`` expression passed to ``from_json`` as a foldable
    Column — the analyzer evaluates it in-plan, replacing the old
    dedicated 1-row ``collect`` job per dict-resource extraction.  The
    driver rows also ship as explicitly-sized pickle partitions (~10k
    lines each, floor 1) instead of defaultParallelism slices: a
    driver-collected feed is small by construction, and 32 near-empty
    pickle partitions taxed every downstream stage of every pipeline run
    (same fix as bpe_train_merges, r10)."""
    import pyspark.sql.functions as F

    lines = [json.dumps(i, default=str) for i in items]
    if not lines:
        str_df = spark.createDataFrame([], schema="value string")
        return str_df.select(
            F.from_json("value", "struct<>").alias("j")
        ).select("j.*")
    width = max(1, min(
        spark.sparkContext.defaultParallelism, (len(lines) + 9_999) // 10_000
    ))
    str_df = spark.createDataFrame(
        spark.sparkContext.parallelize([(line,) for line in lines], width),
        schema="value string",
    )
    schema_col = F.schema_of_json(F.lit(_merge_json_sample(lines)))
    return str_df.select(F.from_json("value", schema_col).alias("j")).select("j.*")


def _merge_json_sample(lines: List[str], max_sample: int = 1000) -> str:
    """Build a representative JSON document for schema inference by
    merging keys across a sample of items (late/nullable keys appear in
    some rows only)."""
    merged: dict = {}

    def merge(dst: dict, src: dict) -> None:
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst.setdefault(k, {}), v)
            elif isinstance(v, list):
                cur = dst.get(k)
                items = [x for x in v if x is not None]
                if isinstance(cur, list):
                    dst[k] = cur + items
                else:
                    dst[k] = items
                if dst[k] and isinstance(dst[k][0], dict):
                    acc: dict = {}
                    for el in dst[k]:
                        if isinstance(el, dict):
                            merge(acc, el)
                    dst[k] = [acc]
            else:
                if dst.get(k) is None or (isinstance(v, float) and isinstance(dst.get(k), int)):
                    dst[k] = v

    for line in lines[:max_sample]:
        obj = json.loads(line)
        if isinstance(obj, dict):
            merge(merged, obj)
    return json.dumps(merged)


class ModelResource(DltResource):
    """SQL-model resource (reference model writer ``writers.py:183`` +
    ``items_normalizers/model.py:27``): the payload is a SELECT statement
    executed by Catalyst at materialization; the normalizer then injects
    ``_dlt_id``/``_dlt_load_id`` like any other resource.  The Spark form
    of ``CREATE TABLE AS SELECT`` transformations."""

    def __init__(self, sql: str, name: str = "model", **hints: Any) -> None:
        self.sql = sql
        super().__init__(None, name=name, **hints)

    def materialize(self, spark: SparkSession) -> Dict[str, DataFrame]:
        df = spark.sql(self.sql)
        return {self._static_table_name(): self._apply_df_steps(df)}


def model(sql: str, name: str = "model", **hints: Any) -> ModelResource:
    return ModelResource(sql, name=name, **hints)


class DltTransformer:
    """A resource fed per-item from a parent resource
    (reference ``decorators.py:794-846``)."""

    def __init__(self, f: Callable[..., Any], name: str, **hints: Any) -> None:
        self.f = f
        self.name = name
        self.hints = hints

    def bind(self, parent: DltResource) -> DltResource:
        def generate() -> Iterable[Any]:
            for item in parent._iter_items():
                out = self.f(item)
                if inspect.isgenerator(out) or isinstance(out, (list, tuple)):
                    yield from out
                else:
                    yield out

        bound = DltResource(generate, name=self.name, **self.hints)
        # parent edge feeds DltSource.decompose("scc") (reference
        # source.py:515 walks the pipe DAG; here the bind site IS the edge)
        bound._dlt_parent = parent.name
        return bound


class DltSource:
    """Groups resources under a shared section/schema
    (reference ``decorators.py:333-366``)."""

    def __init__(self, name: str, resources: List[DltResource]) -> None:
        self.name = name
        self.resources = {r.name: r for r in resources}

    def with_resources(self, *names: str) -> "DltSource":
        for n, r in self.resources.items():
            r.selected = n in names
        return self

    def selected_resources(self) -> List[DltResource]:
        return [r for r in self.resources.values() if r.selected]

    def decompose(self, strategy: str = "none") -> "List[DltSource]":
        """Split the source for orchestrated execution (reference
        ``source.py:515``): ``"none"`` returns the source as-is;
        ``"scc"`` groups SELECTED resources into connected components of
        the resource/parent DAG (undirected, like the reference) — a
        transformer always lands with its parent, independent resources
        each get their own component.  Component order follows resource
        declaration order; each component becomes its own
        :class:`DltSource` sharing this source's name with a suffix."""
        if strategy == "none":
            return [self]
        if strategy != "scc":
            raise ValueError(strategy)
        selected = {r.name: r for r in self.selected_resources()}
        # union-find over parent edges of the FULL pipe DAG (the
        # reference builds undirected SCCs over all pipes then intersects
        # with selected — source.py:515): a parent is a union key even
        # when it is not itself selected, so two selected transformers of
        # one unselected parent land in ONE component
        root: Dict[str, str] = {n: n for n in selected}

        def find(n: str) -> str:
            while root[n] != n:
                root[n] = root[root[n]]
                n = root[n]
            return n

        for n, r in selected.items():
            parent = getattr(r, "_dlt_parent", None)
            if parent is not None:
                root.setdefault(parent, parent)
                root[find(n)] = find(parent)
        groups: Dict[str, List[DltResource]] = {}
        for n in selected:  # declaration order preserved by dict
            groups.setdefault(find(n), []).append(selected[n])
        return [
            DltSource(f"{self.name}_{i}", rs)
            for i, rs in enumerate(groups.values())
        ]


def resource(
    data: Optional[Any] = None,
    /,
    name: Optional[str] = None,
    **hints: Any,
) -> Any:
    """``@resource`` decorator / factory (reference decorators.py:461-543)."""

    def make(fn_or_data: Any, rname: str) -> DltResource:
        return DltResource(fn_or_data, name=rname, **hints)

    if data is not None and not callable(data):
        return make(data, name or "content")
    if data is not None and callable(data):
        return make(data, name or data.__name__)

    def deco(fn: Callable[..., Any]) -> Callable[..., DltResource]:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> DltResource:
            return make(lambda: fn(*args, **kwargs), name or fn.__name__)

        wrapper.__dlt_resource__ = True  # type: ignore[attr-defined]
        return wrapper

    return deco


def transformer(name: Optional[str] = None, **hints: Any) -> Callable:
    def deco(fn: Callable[..., Any]) -> DltTransformer:
        return DltTransformer(fn, name or fn.__name__, **hints)

    return deco


def source(fn: Optional[Callable] = None, name: Optional[str] = None) -> Any:
    def deco(f: Callable[..., Any]) -> Callable[..., DltSource]:
        @functools.wraps(f)
        def wrapper(*args: Any, **kwargs: Any) -> DltSource:
            out = f(*args, **kwargs)
            resources = []
            for item in out if isinstance(out, (list, tuple)) else [out]:
                if isinstance(item, DltResource):
                    resources.append(item)
                elif callable(item) and getattr(item, "__dlt_resource__", False):
                    resources.append(item())
            return DltSource(name or f.__name__, resources)

        return wrapper

    if fn is not None:
        return deco(fn)
    return deco
