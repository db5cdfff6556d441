-- generated: QueryGenerator.randomWalkQuery(seed = 22, minTables = 6,
--   maxTables = 7, minFilters = 2, maxFilters = 4) over FixtureValueSource
SELECT count(*) AS n FROM customer, lineitem, nation, orders, part, region, supplier WHERE p_partkey = l_partkey AND o_orderkey = l_orderkey AND s_suppkey = l_suppkey AND c_custkey = o_custkey AND n_nationkey = s_nationkey AND n_nationkey = c_nationkey AND r_regionkey = n_regionkey AND c_mktsegment < 'FURNITURE' AND r_name <> 'ASIA' AND o_orderpriority <> '2-HIGH' AND l_quantity < 18
