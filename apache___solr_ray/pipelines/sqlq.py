"""SQL front-end catalog entries — the query string is BOTH the engine
input (parsed + compiled onto Ray Data by ``apache___solr_ray.sql``) and
the DuckDB oracle, so the correctness gate checks the compiler end-to-end:
parse → column-pruned scan → vectorized WHERE → partial-aggregate GROUP BY
→ HAVING → projection → distributed ORDER BY/LIMIT.

Reference surface: the Solr SQL module's push-down planner rules
(solr/modules/sql/src/java/org/apache/solr/handler/sql/SolrProject.java,
SolrFilter.java, SolrAggregate.java, SolrSort.java, SolrRules.java).

Float aggregates are rounded with the repo's floor(x*K+0.5)/K convention
INSIDE the SQL (both sides execute it), because f64 accumulation order
differs between the partial-aggregate shuffle and DuckDB's serial sum.
"""

from __future__ import annotations

from apache___solr_ray.sql import sql_query

QUERIES: dict = {}
ORACLE: dict = {}


def _sql(name: str, sql: str) -> None:
    def fn(sf_dir: str, _sql=sql):
        return sql_query(sf_dir, _sql)

    fn.__name__ = name
    fn.__doc__ = f"SQL front-end entry; input == oracle:\n{sql}"
    QUERIES[name] = fn
    ORACLE[name] = sql


_sql(
    "sql_filter_sort",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)

_sql(
    "sql_select_rollup",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC
    """,
)

_sql(
    "sql_group_having",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 25
    ORDER BY n DESC, user_id ASC
    LIMIT 20
    """,
)

_sql(
    "sql_expr_project",
    """
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net
    FROM lineitem
    WHERE l_returnflag IN ('A', 'N') AND l_quantity >= 45
    ORDER BY net DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 15
    """,
)

_sql(
    "sql_global_agg",
    """
    SELECT CAST(count(*) AS BIGINT) AS n,
           floor(avg(value) * 10000 + 0.5) / 10000 AS avg_value,
           floor(min(value) * 10000 + 0.5) / 10000 AS min_v,
           floor(max(value) * 10000 + 0.5) / 10000 AS max_v
    FROM events
    """,
)

_sql(
    "sql_limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O'
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
)

_sql(
    "sql_count_distinct",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uu,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)

_sql(
    "sql_stats_variance",
    """
    SELECT event_type,
           floor(stddev(value) * 10000 + 0.5) / 10000 AS sd,
           floor(variance(value) * 10000 + 0.5) / 10000 AS var
    FROM events
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)

_sql(
    "sql_distinct_like",
    """
    SELECT DISTINCT event_type
    FROM events
    WHERE event_type NOT LIKE '%y' AND props IS NOT NULL
    ORDER BY event_type ASC
    """,
)

_sql(
    "sql_join_segment_revenue",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC
    """,
)

_sql(
    "sql_left_join_nulls",
    """
    SELECT c_custkey, o_orderkey
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE c_custkey <= 25
    ORDER BY c_custkey ASC, o_orderkey ASC
    LIMIT 80
    """,
)

_sql(
    "sql_join_where_both_sides",
    """
    SELECT l_orderkey,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net,
           o_orderpriority
    FROM lineitem l INNER JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o_orderstatus = 'F' AND l_quantity > 49
    ORDER BY net DESC, l_orderkey ASC
    LIMIT 15
    """,
)

_sql(
    "sql_case_conditional_agg",
    """
    SELECT event_type,
           CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS hot,
           CAST(count(*) AS BIGINT) AS n,
           CASE WHEN count(*) > 2200 THEN 'big' ELSE 'small' END AS bucket
    FROM events
    GROUP BY event_type
    ORDER BY event_type ASC
    """,
)

_sql(
    "sql_join_chain_region_revenue",
    """
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name
    ORDER BY r_name ASC
    """,
)

# --- round-5 subquery surface (WHERE-clause subqueries resolved before the
# --- plan compiles: IN/NOT IN -> materialized value set, correlated EXISTS
# --- -> semi-join decorrelation, scalar subquery -> constant) ----------------

_sql(
    "sql_in_subquery",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
    ORDER BY c_custkey
    """,
)

_sql(
    "sql_not_in_subquery",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      AND c_acctbal > 0
    ORDER BY c_custkey
    """,
)

_sql(
    "sql_scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)

_sql(
    "sql_exists_subquery",
    """
    SELECT c_custkey
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)

_sql(
    "sql_not_exists_subquery",
    """
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    ORDER BY c_custkey
    """,
)

# --- round-5 wave 4: scalar-function pack + UNION [ALL] ----------------------

_sql(
    "sql_string_funcs",
    """
    SELECT upper(c_mktsegment) AS seg, substr(c_name, 1, 9) AS pre,
           length(c_name) AS ln, concat(c_mktsegment, ':', c_name) AS tag,
           round(c_acctbal, 1) AS bal
    FROM customer
    WHERE lower(c_mktsegment) LIKE 'b%'
    ORDER BY tag
    LIMIT 40
    """,
)

_sql(
    "sql_union_all",
    """
    SELECT n_name AS name, 'nation' AS kind FROM nation
    UNION ALL
    SELECT r_name AS name, 'region' AS kind FROM region
    ORDER BY name, kind
    """,
)

_sql(
    "sql_union_distinct",
    """
    SELECT c_mktsegment AS v FROM customer
    UNION
    SELECT o_orderpriority AS v FROM orders
    ORDER BY v
    """,
)

_sql(
    "sql_union_mixed_aggregates",
    """
    SELECT event_type AS bucket, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'TOTAL' AS bucket, CAST(count(*) AS BIGINT) AS n FROM events
    ORDER BY n DESC, bucket
    """,
)

_sql(
    "sql_group_by_expression",
    """
    SELECT floor(value / 100) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           floor(avg(value) * 10000 + 0.5) / 10000 AS av
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
)

# -- round-5 closing: WITH (non-recursive CTEs) + derived tables ----------
# (sql.py WithQuery: definitions compile on demand, memoized per
# statement, materialized once however many FROMs reference them)

_sql(
    "sql_cte_group",
    """
    WITH big AS (SELECT o_custkey, o_totalprice FROM orders
                 WHERE o_totalprice > 100000)
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
           floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
    FROM big GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey LIMIT 20
    """,
)

_sql(
    "sql_cte_join_reuse",
    """
    WITH f AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
               WHERE o_orderstatus = 'F'),
         names AS (SELECT c_custkey, c_name FROM customer)
    SELECT c_name, CAST(count(*) AS BIGINT) AS n,
           floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
    FROM f JOIN names ON o_custkey = c_custkey
    GROUP BY c_name
    ORDER BY revenue DESC, c_name LIMIT 15
    """,
)

_sql(
    "sql_derived_table_agg",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_cust,
           floor(avg(n) * 10000 + 0.5) / 10000 AS avg_orders,
           CAST(max(n) AS BIGINT) AS max_orders
    FROM (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) t
    """,
)

_sql(
    "sql_cte_union_distinct",
    """
    WITH u AS (SELECT c_nationkey AS k FROM customer
               UNION SELECT s_nationkey FROM supplier)
    SELECT CAST(count(*) AS BIGINT) AS n FROM u
    """,
)
