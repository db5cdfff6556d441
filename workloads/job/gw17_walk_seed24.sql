-- generated: QueryGenerator.randomWalkQuery(seed = 24, minTables = 6,
--   maxTables = 7, minFilters = 2, maxFilters = 4) over FixtureValueSource
SELECT count(*) AS n FROM customer, lineitem, nation, orders, part, region, supplier WHERE n_nationkey = c_nationkey AND n_nationkey = s_nationkey AND r_regionkey = n_regionkey AND c_custkey = o_custkey AND o_orderkey = l_orderkey AND s_suppkey = l_suppkey AND p_partkey = l_partkey AND l_returnflag > 'N' AND p_size = 24
