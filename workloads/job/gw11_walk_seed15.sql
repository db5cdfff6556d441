-- generated: QueryGenerator.randomWalkQuery(seed = 15, minTables = 6,
--   maxTables = 7, minFilters = 2, maxFilters = 4) over FixtureValueSource
SELECT count(*) AS n FROM customer, lineitem, nation, orders, part, region, supplier WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey AND n_nationkey = s_nationkey AND c_custkey = o_custkey AND s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND p_partkey = l_partkey AND p_size < 30 AND n_name = 'NATION_19' AND p_type = 'STANDARD' AND s_nationkey <> 7
