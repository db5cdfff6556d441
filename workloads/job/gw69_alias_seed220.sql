-- generated: QueryGenerator.aliasWalkQuery(seed = 220,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, region r2, supplier s1, supplier s2, customer c1, nation n2, nation n3, customer c2, region r3, orders o1, orders o2 WHERE n1.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n1.n_regionkey AND s1.s_nationkey = n1.n_nationkey AND s2.s_nationkey = n1.n_nationkey AND c1.c_nationkey = n1.n_nationkey AND n2.n_regionkey = r1.r_regionkey AND n3.n_regionkey = r2.r_regionkey AND c2.c_nationkey = n1.n_nationkey AND r3.r_regionkey = n2.n_regionkey AND o1.o_custkey = c1.c_custkey AND o2.o_custkey = c2.c_custkey AND n3.n_name > 'NATION_3' AND n3.n_regionkey < 2
