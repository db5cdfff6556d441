-- generated: QueryGenerator.aliasWalkQuery(seed = 129,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, nation n2, nation n3, customer c1, orders o1, supplier s1, customer c2, region r2, customer c3, orders o2, region r3, orders o3 WHERE n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r1.r_regionkey AND n3.n_regionkey = r1.r_regionkey AND c1.c_nationkey = n2.n_nationkey AND o1.o_custkey = c1.c_custkey AND s1.s_nationkey = n1.n_nationkey AND c2.c_custkey = o1.o_custkey AND r2.r_regionkey = n1.n_regionkey AND c3.c_nationkey = n3.n_nationkey AND o2.o_custkey = c1.c_custkey AND r3.r_regionkey = n1.n_regionkey AND o3.o_custkey = c1.c_custkey AND n3.n_regionkey = 0 AND o3.o_orderpriority < '4-NOT SPECIFIED' AND r3.r_name <> 'AMERICA' AND n3.n_name <> 'NATION_10'
