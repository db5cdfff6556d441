SELECT count(*) AS n_journeys
FROM events s, events v, events c, events p, events e
WHERE s.user_id = v.user_id AND v.user_id = c.user_id
  AND c.user_id = p.user_id AND p.user_id = e.user_id
  AND s.event_type = 'signup' AND v.event_type = 'view'
  AND c.event_type = 'click' AND p.event_type = 'purchase'
  AND e.event_type = 'error'
  AND s.ts < v.ts AND v.ts < c.ts AND c.ts < p.ts AND p.ts < e.ts
