-- generated: QueryGenerator.aliasWalkQuery(seed = 212,
--   minTables = 8, maxTables = 13, minFilters = 2, maxFilters = 4,
--   crossOrFilter = true, includeEvents = false)
--   over FixtureValueSource; validated non-empty on sf0.01
SELECT count(*) AS n FROM region r1, nation n1, nation n2, customer c1, customer c2, orders o1, customer c3, nation n3 WHERE n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r1.r_regionkey AND c1.c_nationkey = n1.n_nationkey AND c2.c_nationkey = n1.n_nationkey AND o1.o_custkey = c2.c_custkey AND c3.c_nationkey = n2.n_nationkey AND n3.n_regionkey = r1.r_regionkey AND n3.n_name > 'NATION_24' AND n2.n_regionkey < 2 AND c2.c_mktsegment = 'BUILDING' AND (o1.o_orderpriority = '5-LOW' OR r1.r_name = 'AMERICA')
