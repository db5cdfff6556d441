-- generated: QueryGenerator.aliasWalkQuery(seed = 133,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = false, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, nation n2, customer c1, nation n3, region r2, customer c2, region r3, orders o1 WHERE n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r1.r_regionkey AND c1.c_nationkey = n2.n_nationkey AND n3.n_regionkey = r1.r_regionkey AND r2.r_regionkey = n3.n_regionkey AND c2.c_nationkey = n2.n_nationkey AND r3.r_regionkey = n2.n_regionkey AND o1.o_custkey = c1.c_custkey AND c1.c_mktsegment = 'HOUSEHOLD' AND n1.n_name < 'NATION_14' AND r1.r_name = 'ASIA'
