-- generated: QueryGenerator.aliasWalkQuery(seed = 243,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM lineitem l1, supplier s1, nation n1, nation n2, lineitem l2, part p1, supplier s2, customer c1 WHERE s1.s_suppkey = l1.l_suppkey AND n1.n_nationkey = s1.s_nationkey AND n2.n_nationkey = s1.s_nationkey AND l2.l_suppkey = s1.s_suppkey AND p1.p_partkey = l1.l_partkey AND s2.s_nationkey = n2.n_nationkey AND c1.c_nationkey = n1.n_nationkey AND s1.s_nationkey > 12 AND l2.l_quantity = 13 AND c1.c_mktsegment < 'MACHINERY' AND p1.p_size <> 48 AND (n1.n_regionkey = 0 OR s2.s_nationkey = 12)
