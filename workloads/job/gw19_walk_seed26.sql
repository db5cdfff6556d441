-- generated: QueryGenerator.randomWalkQuery(seed = 26, minTables = 6,
--   maxTables = 7, minFilters = 2, maxFilters = 4) over FixtureValueSource
SELECT count(*) AS n FROM customer, lineitem, nation, orders, part, region, supplier WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey AND n_nationkey = s_nationkey AND c_custkey = o_custkey AND n_nationkey = c_nationkey AND r_regionkey = n_regionkey AND p_size <> 4 AND p_type <> 'LARGE' AND r_name = 'EUROPE' AND o_orderstatus <> 'P'
