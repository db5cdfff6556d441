-- generated: QueryGenerator.randomWalkQuery(seed = 12, minTables = 6,
--   maxTables = 7, minFilters = 2, maxFilters = 4) over FixtureValueSource
SELECT count(*) AS n FROM customer, lineitem, nation, orders, part, region, supplier WHERE n_nationkey = c_nationkey AND c_custkey = o_custkey AND r_regionkey = n_regionkey AND n_nationkey = s_nationkey AND o_orderkey = l_orderkey AND s_suppkey = l_suppkey AND p_partkey = l_partkey AND n_regionkey > 1 AND l_linestatus < 'O' AND n_name > 'NATION_22' AND o_orderpriority <> '3-MEDIUM'
