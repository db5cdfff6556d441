-- generated: QueryGenerator.aliasWalkQuery(seed = 126,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM nation n1, customer c1, orders o1, lineitem l1, part p1, customer c2, part p2, supplier s1, region r1 WHERE c1.c_nationkey = n1.n_nationkey AND o1.o_custkey = c1.c_custkey AND l1.l_orderkey = o1.o_orderkey AND p1.p_partkey = l1.l_partkey AND c2.c_custkey = o1.o_custkey AND p2.p_partkey = l1.l_partkey AND s1.s_suppkey = l1.l_suppkey AND r1.r_regionkey = n1.n_regionkey AND c1.c_mktsegment = 'BUILDING' AND p2.p_type < 'LARGE' AND c2.c_mktsegment = 'BUILDING'
