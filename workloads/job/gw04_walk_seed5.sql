-- generated: QueryGenerator.randomWalkQuery(seed = 5, minTables = 6,
--   maxTables = 7, minFilters = 2, maxFilters = 4) over FixtureValueSource
SELECT count(*) AS n FROM customer, lineitem, nation, orders, part, region, supplier WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND n_nationkey = s_nationkey AND r_regionkey = n_regionkey AND n_nationkey = c_nationkey AND c_custkey = o_custkey AND l_linestatus <> 'F' AND l_returnflag <> 'N' AND n_name = 'NATION_5' AND p_size <> 16
