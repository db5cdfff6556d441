-- generated: QueryGenerator.aliasWalkQuery(seed = 162,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM customer c1, nation n1, supplier s1, lineitem l1, region r1, orders o1, nation n2, supplier s2 WHERE n1.n_nationkey = c1.c_nationkey AND s1.s_nationkey = n1.n_nationkey AND l1.l_suppkey = s1.s_suppkey AND r1.r_regionkey = n1.n_regionkey AND o1.o_orderkey = l1.l_orderkey AND n2.n_regionkey = r1.r_regionkey AND s2.s_nationkey = n1.n_nationkey AND o1.o_orderstatus = 'F' AND n2.n_name > 'NATION_10'
