"""Deep mode: recursive validation as iterative dataflow.

Static columnar compilation (compile/columnar.py) unrolls the schema into
one expression — exact and shuffle-free, but cyclic ``$ref`` graphs blow up
combinatorially and values past the unroll bound validate vacuously
(docs/deep_mode_design.md). Deep mode removes that limit the way Spark
removes any recursion: a driver loop over a *frontier* DataFrame.

1. Register the distinct SchemaNode objects of the (possibly cyclic) graph;
   per node, compile its NON-recursive keywords once against a shared
   variant column (one CASE branch per node — linear in schema size).
2. Top-down: explode each row's structural children (properties / items /
   pattern & additional properties / combinator branches / schema
   dependencies) into the next frontier. Iterations = actual data depth —
   exactly the reference's termination argument (validator.rb relies on
   finite data, loop detection disabled).
3. Bottom-up: per level, aggregate child verdicts by parent row and combine
   with combinator semantics (allOf/anyOf/oneOf/not), propagating errors the
   way the reference does (allOf branch errors surface, anyOf/oneOf branch
   errors become sub_errors, not-branch errors are discarded).

Every step is DataFrame-native: one explode per level down, one
groupBy(parent) per level up. Violation ordering within a document is not
the reference's traversal order (aggregation scrambles it); verdicts,
error types, paths and messages are identical — tests compare multisets.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession, functions as F

from .compile.columnar import ERR_ARRAY_DDL, ColumnarCompiler, _combine
from .compile.sqlgen import iff, sql_str
from .compile.values import VariantValue
from .document_store import DocumentStore
from .engine import compile_schema
from .expander import schema_children
from .regex_translate import translate_regex
from .schema import SchemaNode

CHILD_STRUCT_DDL = ("struct<slot:string,node_id:int,v:variant,path:string,"
                    "kind:string,branch:int,ppointer:string>")


@dataclass
class _NodeInfo:
    node: SchemaNode
    node_id: int


class DeepValidator:
    """Validates a variant column against a (possibly cyclic) schema with a
    driver loop bounded only by the data's actual nesting depth."""

    def __init__(self, spark: SparkSession, schema: Union[dict, SchemaNode],
                 store: Optional[DocumentStore] = None, max_depth: int = 64,
                 spill_path: Optional[str] = None):
        self.spark = spark
        self.max_depth = max_depth
        # per-level spill for frontiers too big for block-manager storage
        # (10^9-doc corpora): each level persists to parquet instead of
        # localCheckpoint, so the bottom-up combine re-reads from disk and
        # executors never hold every level's blocks at once
        self.spill_path = spill_path
        self.root = compile_schema(schema, store)
        self.nodes: List[_NodeInfo] = []
        self._ids: Dict[int, int] = {}
        self._register(self.root)

    # --- registry -------------------------------------------------------

    def _register(self, node: SchemaNode) -> int:
        if id(node) in self._ids:
            return self._ids[id(node)]
        nid = len(self.nodes)
        self._ids[id(node)] = nid
        self.nodes.append(_NodeInfo(node, nid))
        for child in self._structural_children(node):
            self._register(child)
        return nid

    @staticmethod
    def _structural_children(node: SchemaNode) -> List[SchemaNode]:
        out = []
        out.extend(c for c in node.all_of if isinstance(c, SchemaNode))
        out.extend(c for c in node.any_of if isinstance(c, SchemaNode))
        out.extend(c for c in node.one_of if isinstance(c, SchemaNode))
        if isinstance(node.not_, SchemaNode):
            out.append(node.not_)
        out.extend(v for v in (node.properties or {}).values() if isinstance(v, SchemaNode))
        out.extend(v for v in (node.pattern_properties or {}).values() if isinstance(v, SchemaNode))
        if isinstance(node.additional_properties, SchemaNode):
            out.append(node.additional_properties)
        if node.items is not None:
            out.append(node.items)
        if node.tuple_items:
            out.extend(node.tuple_items)
        if isinstance(node.additional_items, SchemaNode):
            out.append(node.additional_items)
        out.extend(v for v in (node.dependencies or {}).values() if isinstance(v, SchemaNode))
        return out

    # --- per-node compiled SQL -------------------------------------------

    def _local_case(self) -> Tuple[str, str]:
        """CASE node_id dispatch of each node's non-recursive keyword checks
        over the shared variant column ``v``."""
        valid_branches, error_branches = [], []
        for info in self.nodes:
            compiler = _LocalCompiler()
            parts = compiler.compile_parts(info.node, VariantValue("v"), path="path")
            combined = _combine(parts)
            valid_branches.append(f"WHEN node_id = {info.node_id} THEN {combined.valid}")
            error_branches.append(f"WHEN node_id = {info.node_id} THEN {combined.errors}")
        valid = "CASE " + " ".join(valid_branches) + " ELSE true END"
        errors = ("CASE " + " ".join(error_branches)
                  + f" ELSE cast(null as {ERR_ARRAY_DDL}) END")
        return valid, errors

    def _children_case(self) -> str:
        """CASE node_id dispatch producing array<child-struct> per row."""
        branches = []
        for info in self.nodes:
            gen = self._children_sql(info.node)
            branches.append(f"WHEN node_id = {info.node_id} THEN {gen}")
        return ("CASE " + " ".join(branches)
                + f" ELSE cast(array() as array<{CHILD_STRUCT_DDL}>) END")

    def _children_sql(self, node: SchemaNode) -> str:
        v = VariantValue("v")
        arrays: List[str] = []

        # every child carries the *generating* node's pointer so combinator
        # errors assembled at the parent level cite the right schema location
        # (columnar parity: _any_of/_one_of pass schema.pointer)
        ppointer = sql_str(node.pointer or "#")

        def child(slot: str, nid: int, value_sql: str, path_sql: str,
                  kind: str, branch: int = -1) -> str:
            return (f"named_struct('slot', {sql_str(slot)}, 'node_id', {nid}, "
                    f"'v', {value_sql}, 'path', {path_sql}, "
                    f"'kind', {sql_str(kind)}, 'branch', {branch}, "
                    f"'ppointer', {ppointer})")

        def nid(n: SchemaNode) -> int:
            return self._ids[id(n)]

        const: List[str] = []
        for i, c in enumerate(node.all_of):
            if isinstance(c, SchemaNode):
                const.append(child(f"all:{i}", nid(c), "v", "path", "all", i))
        for i, c in enumerate(node.any_of):
            if isinstance(c, SchemaNode):
                const.append(child(f"any:{i}", nid(c), "v", "path", "any", i))
        for i, c in enumerate(node.one_of):
            if isinstance(c, SchemaNode):
                const.append(child(f"one:{i}", nid(c), "v", "path", "one", i))
        if isinstance(node.not_, SchemaNode):
            const.append(child("not", nid(node.not_), "v", "path", "not"))
        for key, dep in (node.dependencies or {}).items():
            if isinstance(dep, SchemaNode):
                guarded = iff(v.truthy_property(key),
                              child(f"dep:{key}", nid(dep), "v", "path", "check"),
                              "null")
                const.append(guarded)
        for key, sub in (node.properties or {}).items():
            if isinstance(sub, SchemaNode):
                guarded = iff(
                    f"({v.is_type('object')} AND {v.has_property(key)})",
                    child(f"p:{key}", nid(sub),
                          f"element_at({v.object_map()}, {sql_str(key)})",
                          f"concat(path, {sql_str('/' + key)})", "check"),
                    "null")
                const.append(guarded)
        if const:
            arrays.append("filter(array(" + ", ".join(const) + "), c -> c IS NOT NULL)")

        obj_guard = v.is_type("object")
        entries = f"map_entries({v.object_map()})"
        for pi, (pattern, sub) in enumerate((node.pattern_properties or {}).items()):
            if not isinstance(sub, SchemaNode):
                continue
            ok, java = translate_regex(pattern)
            if not ok:
                continue
            gen = (f"transform(filter({entries}, e -> e.key RLIKE {sql_str(java)}), "
                   f"e -> " + child(f"pp:{pi}", nid(sub), "e.value",
                                    "concat(path, '/', e.key)", "check") + ")")
            arrays.append(iff(obj_guard, gen, f"cast(array() as array<{CHILD_STRUCT_DDL}>)"))

        if isinstance(node.additional_properties, SchemaNode):
            conds = []
            prop_keys = [k for k in (node.properties or {})]
            if prop_keys:
                keys_list = ", ".join(sql_str(k) for k in prop_keys)
                conds.append(f"NOT (e.key IN ({keys_list}))")
            for pattern in (node.pattern_properties or {}):
                ok, java = translate_regex(pattern)
                if ok:
                    conds.append(f"NOT (e.key RLIKE {sql_str(java)})")
            cond = " AND ".join(conds) if conds else "true"
            gen = (f"transform(filter({entries}, e -> {cond}), "
                   f"e -> " + child("ap", nid(node.additional_properties), "e.value",
                                    "concat(path, '/', e.key)", "check") + ")")
            arrays.append(iff(obj_guard, gen, f"cast(array() as array<{CHILD_STRUCT_DDL}>)"))

        arr_guard = v.is_type("array")
        elems = v.array_elements()
        if node.items is not None and node.tuple_items is None:
            gen = (f"transform({elems}, (x, i) -> "
                   + child("i", nid(node.items), "x",
                           "concat(path, '/', cast(i as string))", "check") + ")")
            arrays.append(iff(arr_guard, gen, f"cast(array() as array<{CHILD_STRUCT_DDL}>)"))
        if node.tuple_items:
            n = len(node.tuple_items)
            pos = []
            for idx, sub in enumerate(node.tuple_items):
                pos.append(iff(
                    f"(size({elems}) > {idx} AND size({elems}) >= {n})",
                    child(f"t:{idx}", nid(sub), f"element_at({elems}, {idx + 1})",
                          f"concat(path, {sql_str('/' + str(idx))})", "check"),
                    "null"))
            gen = "filter(array(" + ", ".join(pos) + "), c -> c IS NOT NULL)"
            arrays.append(iff(arr_guard, gen, f"cast(array() as array<{CHILD_STRUCT_DDL}>)"))
            if isinstance(node.additional_items, SchemaNode):
                gen = (f"filter(transform({elems}, (x, i) -> "
                       + iff(f"(i >= {n} AND size({elems}) >= {n})",
                             child("ti", nid(node.additional_items), "x",
                                   "concat(path, '/', cast(i as string))", "check"),
                             "null")
                       + "), c -> c IS NOT NULL)")
                arrays.append(iff(arr_guard, gen,
                                  f"cast(array() as array<{CHILD_STRUCT_DDL}>)"))

        if not arrays:
            return f"cast(array() as array<{CHILD_STRUCT_DDL}>)"
        if len(arrays) == 1:
            return arrays[0]
        return "concat(" + ", ".join(arrays) + ")"

    # --- run ---------------------------------------------------------------

    def validate(self, df: DataFrame, variant_col: str, id_col: str) -> DataFrame:
        """Returns (id, is_valid, violations array) — same surface as the
        columnar engine's annotated output."""
        from .engine import ValidationEngine  # ensure session UDFs/conf

        ValidationEngine(self.spark)

        valid_sql, errors_sql = self._local_case()
        children_sql = self._children_case()

        root = df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).alias("node_id"),
            F.col(variant_col).alias("v"),
            F.lit("#").alias("path"),
            F.lit("root").alias("slot"),
            F.lit("check").alias("kind"),
            F.lit(-1).alias("branch"),
            F.lit(self.root.pointer or "#").alias("ppointer"),
            F.monotonically_increasing_id().cast("string").alias("row_id"),
            F.lit(None).cast("string").alias("parent_row_id"),
        )

        def materialize(df: DataFrame, depth: int) -> DataFrame:
            if self.spill_path is None:
                return df.localCheckpoint()
            path = f"{self.spill_path}/level={depth}"
            df.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)

        levels: List[DataFrame] = []
        frontier = root
        depth = 0
        while depth < self.max_depth:
            annotated = materialize(frontier.withColumns({
                "local_valid": F.expr(valid_sql),
                "local_errors": F.expr(f"coalesce({errors_sql}, cast(array() as {ERR_ARRAY_DDL}))"),
                "children": F.expr(children_sql),
            }), depth)
            levels.append(annotated)
            nxt = (
                annotated.where(F.size("children") > 0)
                .select("doc_id", F.col("row_id").alias("parent_row_id"),
                        F.posexplode("children").alias("pos", "c"))
                .select(
                    "doc_id",
                    F.col("c.node_id").alias("node_id"),
                    F.col("c.v").alias("v"),
                    F.col("c.path").alias("path"),
                    F.col("c.slot").alias("slot"),
                    F.col("c.kind").alias("kind"),
                    F.col("c.branch").alias("branch"),
                    F.col("c.ppointer").alias("ppointer"),
                    F.concat("parent_row_id", F.lit("."), F.col("pos").cast("string")).alias("row_id"),
                    "parent_row_id",
                )
            )
            depth += 1
            # DataFrame.isEmpty stays in Catalyst (limit-1 scan); .rdd would
            # re-analyze the full plan and schedule an RDD job per level
            if nxt.isEmpty():
                frontier = None
                break
            frontier = nxt

        # bottom-up combine
        results: Optional[DataFrame] = None  # (parent_row_id-keyed child stats)
        for annotated in reversed(levels):
            cur = annotated
            if results is not None:
                cur = cur.join(results, cur["row_id"] == results["crid"], "left").drop("crid")
            else:
                cur = (cur
                       .withColumn("child_valid", F.lit(True))
                       .withColumn("child_errors", F.expr(f"cast(array() as {ERR_ARRAY_DDL})"))
                       .withColumn("comb_valid", F.lit(True))
                       .withColumn("comb_errors", F.expr(f"cast(array() as {ERR_ARRAY_DDL})")))
            total_valid = (F.col("local_valid") & F.coalesce(F.col("child_valid"), F.lit(True))
                           & F.coalesce(F.col("comb_valid"), F.lit(True)))
            total_errors = F.expr(
                "flatten(filter(array(local_errors, child_errors, comb_errors), a -> a IS NOT NULL))")
            cur = cur.withColumn("valid", total_valid).withColumn("errors", total_errors)
            if annotated is levels[0]:
                return cur.select(
                    F.col("doc_id"),
                    F.col("valid").alias("is_valid"),
                    F.col("errors").alias("violations"),
                )
            results = self._combine_level(cur)
        raise AssertionError("unreachable")

    def _combine_level(self, cur: DataFrame) -> DataFrame:
        """Aggregate one level's results up to the parent rows."""

        def branch_sub(kind: str):
            """Branch errors as a branch-ordered JSON array-of-arrays —
            byte-compatible with the columnar engine's
            to_json(array(errs_0, errs_1, ...)) sub_errors layout."""
            pairs = F.sort_array(F.collect_list(
                F.when(F.col("kind") == kind,
                       F.struct(F.col("branch"), F.col("errors").alias("errs")))))
            return F.to_json(F.transform(pairs, lambda x: x["errs"]))

        agg = (
            cur.groupBy("parent_row_id")
            .agg(
                F.min(F.when(F.col("kind") == "check", F.col("valid"))).alias("checks_ok"),
                F.flatten(F.collect_list(
                    F.when(F.col("kind").isin("check", "all"), F.col("errors")))).alias("child_errs"),
                F.count(F.when(F.col("kind") == "all", 1)).alias("n_all"),
                F.sum(F.when(F.col("kind") == "all", F.col("valid").cast("int"))).alias("all_ok"),
                F.count(F.when(F.col("kind") == "any", 1)).alias("n_any"),
                F.sum(F.when(F.col("kind") == "any", F.col("valid").cast("int"))).alias("any_ok"),
                branch_sub("any").alias("any_sub"),
                F.count(F.when(F.col("kind") == "one", 1)).alias("n_one"),
                F.sum(F.when(F.col("kind") == "one", F.col("valid").cast("int"))).alias("one_ok"),
                branch_sub("one").alias("one_sub"),
                F.count(F.when(F.col("kind") == "not", 1)).alias("n_not"),
                F.sum(F.when(F.col("kind") == "not", F.col("valid").cast("int"))).alias("not_ok"),
                # combinator/dependency children carry the parent's own path
                F.first(F.when(F.col("kind").isin("all", "any", "one", "not"),
                               F.col("path")), ignorenulls=True).alias("ppath"),
                F.first(F.when(F.col("kind").isin("all", "any", "one", "not"),
                               F.col("ppointer")), ignorenulls=True).alias("ppointer"),
                F.first("parent_row_id").alias("crid"),
            )
        )

        def err(cond, etype, msg, sub=None):
            return F.when(cond, F.array(F.struct(
                F.col("ppath").alias("path"),
                F.lit(etype).alias("error_type"),
                F.coalesce(F.col("ppointer"), F.lit("#")).alias("schema_pointer"),
                (msg if not isinstance(msg, str) else F.lit(msg)).alias("message"),
                (sub if sub is not None else F.lit(None).cast("string")).alias("sub_errors"),
                # deep-mode combinator rows are built post-aggregation where
                # the variant value is out of scope; leaf errors (from the
                # columnar compiler) carry the real data_json
                F.lit(None).cast("string").alias("data_json"),
            ))).otherwise(F.expr(f"cast(array() as {ERR_ARRAY_DDL})"))

        all_fail = (F.col("n_all") > 0) & (F.col("all_ok") < F.col("n_all"))
        any_fail = (F.col("n_any") > 0) & (F.coalesce(F.col("any_ok"), F.lit(0)) == 0)
        one_fail = (F.col("n_one") > 0) & (F.coalesce(F.col("one_ok"), F.lit(0)) != 1)
        not_fail = (F.col("n_not") > 0) & (F.coalesce(F.col("not_ok"), F.lit(0)) > 0)
        one_msg = F.when(F.coalesce(F.col("one_ok"), F.lit(0)) == 0,
                         F.lit('No subschema in "oneOf" matched.')) \
            .otherwise(F.lit('More than one subschema in "oneOf" matched.'))

        comb_errors = F.concat(
            err(all_fail, "all_of_failed", 'Not all subschemas of "allOf" matched.'),
            err(any_fail, "any_of_failed", 'No subschema in "anyOf" matched.', F.col("any_sub")),
            err(one_fail, "one_of_failed", one_msg, F.col("one_sub")),
            err(not_fail, "not_failed", 'Matched "not" subschema.'),
        )
        comb_valid = ~(all_fail | any_fail | one_fail | not_fail)

        return agg.select(
            F.col("crid"),
            (F.coalesce(F.col("checks_ok"), F.lit(True))).alias("child_valid"),
            F.coalesce(F.col("child_errs"),
                       F.expr(f"cast(array() as {ERR_ARRAY_DDL})")).alias("child_errors"),
            comb_valid.alias("comb_valid"),
            comb_errors.alias("comb_errors"),
        )


class _LocalCompiler(ColumnarCompiler):
    """ColumnarCompiler that skips recursive keywords — structural recursion
    (children/combinator verdicts) is handled by the frontier loop and the
    bottom-up combine. Tuple/list item COUNT checks stay local, and the
    additionalProperties=false extra-key check keeps the node's original
    property/pattern key lists."""

    def _all_of(self, schema, value, path, stack):
        return None

    def _any_of(self, schema, value, path, stack):
        return None

    def _one_of(self, schema, value, path, stack):
        return None

    def _not(self, schema, value, path, stack):
        return None

    def _properties_parts(self, schema, value, path, stack):
        return []

    def _pattern_properties_parts(self, schema, value, path, stack):
        return []

    def _additional_properties(self, schema, value, path, stack):
        if isinstance(schema.additional_properties, SchemaNode):
            return None  # schema-form extras validate as structural children
        return super()._additional_properties(schema, value, path, stack)

    def _dependencies_parts(self, schema, value, path, stack):
        saved = schema.dependencies
        try:
            schema.dependencies = {k: v for k, v in (saved or {}).items()
                                   if isinstance(v, list)}
            return super()._dependencies_parts(schema, value, path, stack)
        finally:
            schema.dependencies = saved

    def _items(self, schema, value, path, stack):
        from .compile.columnar import TRIVIAL, _combine as combine_parts, _fail
        from .compile.sqlgen import concat as sql_concat, fn

        if schema.tuple_items is None:
            return TRIVIAL  # list-form element checks are structural children
        # tuple count semantics (validator.rb:257-275), counts only
        elems = value.array_elements()
        size = fn("size", elems)
        n = len(schema.tuple_items)
        too_few = f"({size} < {n})"
        too_few_msg = sql_concat(
            sql_str(f"{n} item{'' if n == 1 else 's'} required; only "),
            f"cast({size} as string)",
            iff(f"({size} = 1)", "' was'", "' were'"),
            sql_str(" supplied."),
        )
        parts = [_fail(too_few, path, "min_items_failed", schema.pointer, too_few_msg)]
        if schema.additional_items is False:
            too_many = f"(({size} > {n}) AND NOT {too_few})"
            too_many_msg = sql_concat(
                sql_str(f"No more than {n} item{' is' if n == 1 else 's are'} allowed; "),
                f"cast({size} as string)",
                iff(f"({size} > 1)", "' were'", "' was'"),
                sql_str(" supplied."),
            )
            parts.append(_fail(too_many, path, "max_items_failed", schema.pointer, too_many_msg))
        return combine_parts(parts)
