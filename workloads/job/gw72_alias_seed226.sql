-- generated: QueryGenerator.aliasWalkQuery(seed = 226,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM part p1, lineitem l1, lineitem l2, part p2, lineitem l3, supplier s1, nation n1, supplier s2, part p3, supplier s3, nation n2, orders o1, region r1 WHERE l1.l_partkey = p1.p_partkey AND l2.l_partkey = p1.p_partkey AND p2.p_partkey = l1.l_partkey AND l3.l_partkey = p1.p_partkey AND s1.s_suppkey = l3.l_suppkey AND n1.n_nationkey = s1.s_nationkey AND s2.s_suppkey = l1.l_suppkey AND p3.p_partkey = l1.l_partkey AND s3.s_nationkey = n1.n_nationkey AND n2.n_nationkey = s2.s_nationkey AND o1.o_orderkey = l3.l_orderkey AND r1.r_regionkey = n1.n_regionkey AND l1.l_returnflag > 'N' AND o1.o_orderpriority > '3-MEDIUM' AND s2.s_nationkey = 2
