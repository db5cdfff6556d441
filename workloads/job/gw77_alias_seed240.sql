-- generated: QueryGenerator.aliasWalkQuery(seed = 240,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, nation n2, region r2, nation n3, customer c1, supplier s1, region r3, customer c2, supplier s2, lineitem l1 WHERE n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n1.n_regionkey AND n3.n_regionkey = r2.r_regionkey AND c1.c_nationkey = n2.n_nationkey AND s1.s_nationkey = n3.n_nationkey AND r3.r_regionkey = n2.n_regionkey AND c2.c_nationkey = n2.n_nationkey AND s2.s_nationkey = n2.n_nationkey AND l1.l_suppkey = s2.s_suppkey AND l1.l_returnflag = 'A' AND n3.n_name = 'NATION_3' AND c2.c_mktsegment > 'FURNITURE'
