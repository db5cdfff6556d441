SELECT e.event_type, count(*) AS n
FROM events e, events f
WHERE e.user_id = f.user_id
  AND e.props LIKE '%"k": 1%'
  AND f.event_type = 'signup'
  AND e.ts > f.ts
GROUP BY e.event_type ORDER BY e.event_type
