-- generated: QueryGenerator.randomWalkQuery(seed = 23, minTables = 6,
--   maxTables = 7, minFilters = 2, maxFilters = 4) over FixtureValueSource
SELECT count(*) AS n FROM customer, lineitem, nation, orders, part, region, supplier WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey AND n_nationkey = s_nationkey AND c_custkey = o_custkey AND o_orderkey = l_orderkey AND s_suppkey = l_suppkey AND p_partkey = l_partkey AND p_brand <> 'Brand#20' AND l_returnflag = 'R' AND n_regionkey = 1
