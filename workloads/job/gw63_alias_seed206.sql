-- generated: QueryGenerator.aliasWalkQuery(seed = 206,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM part p1, lineitem l1, part p2, lineitem l2, lineitem l3, supplier s1, supplier s2, supplier s3 WHERE l1.l_partkey = p1.p_partkey AND p2.p_partkey = l1.l_partkey AND l2.l_partkey = p1.p_partkey AND l3.l_partkey = p2.p_partkey AND s1.s_suppkey = l3.l_suppkey AND s2.s_suppkey = l1.l_suppkey AND s3.s_suppkey = l2.l_suppkey AND p2.p_brand = 'Brand#18' AND p1.p_brand < 'Brand#22' AND l1.l_linestatus <> 'F' AND p1.p_size < 33
